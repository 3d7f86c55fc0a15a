"""End-to-end curation job: gates -> kept train set -> chunks -> shards
on disk with a write-integrity-checked manifest."""

import duckdb
import pytest

from t2p_spark.curate import run_curation_job

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    summary = run_curation_job(spark, SF, out)
    return out, summary


def test_funnel_written_matches_query(spark, job_out):
    """The written funnel/ parquet must equal the curate_attrition twin's
    rows — the job is the query, materialized."""
    from t2p_spark.textkit import run_textkit

    out, _ = job_out
    written = sorted(tuple(r) for r in
                     spark.read.parquet(f"{out}/funnel").collect())
    q = sorted(tuple(r) for r in
               run_textkit(spark, SF, "curate_attrition").collect())
    assert written == q


def test_kept_train_consistent_with_funnel(job_out):
    out, s = job_out
    assert s["n_kept_train"] == s["funnel"]["5_split_train"]
    assert 0 < s["n_kept_train"] < s["n_input"]


def test_shards_and_manifest_integrity(job_out):
    """Recompute the manifest from the written shard files with an
    INDEPENDENT engine (DuckDB) and cross-check counts/tokens/digest;
    shard assignment must be the documented pure function."""
    out, s = job_out
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT shard_id, COUNT(*) AS n_chunks,
               SUM(n_chunk_tokens) AS total_tokens,
               bit_xor(fp60) AS content_fp60,
               SUM(CASE WHEN
                     CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR),
                       '#', CAST(chunk_idx AS VARCHAR))), 1, 15)) AS BIGINT)
                     % {s['n_shards']} <> shard_id THEN 1 ELSE 0 END)
                 AS n_misassigned
        FROM read_parquet('{out}/shards/*/*.parquet', hive_partitioning=1)
        GROUP BY shard_id ORDER BY shard_id
    """).fetchall()
    manifest = {r[0]: r for r in con.sql(
        f"SELECT shard_id, n_chunks, total_tokens, content_fp60 "
        f"FROM read_parquet('{out}/manifest/*.parquet')").fetchall()}
    assert len(rows) == s["n_shards"]
    assert sum(r[1] for r in rows) == s["n_chunks"]
    for shard_id, n_chunks, tokens, fp, mis in rows:
        assert mis == 0, f"shard {shard_id}: misassigned chunks"
        m = manifest[shard_id]
        assert (m[1], m[2], m[3]) == (n_chunks, tokens, fp), shard_id


def test_resume_rewrites_only_damaged_shards(spark, job_out, tmp_path):
    """Shard-level resume (the extract job's bucket-resume design): after
    a crash that loses one shard partition and corrupts another, --resume
    must rewrite exactly those two and leave every intact shard's files
    untouched, ending byte-identical to the clean run's manifest."""
    import os
    import shutil

    out, s = job_out
    # work on a copy so the module-scoped fixture stays intact
    my = str(tmp_path / "curated")
    shutil.copytree(out, my)
    clean = sorted(tuple(r) for r in
                   spark.read.parquet(f"{my}/manifest").collect())

    shutil.rmtree(f"{my}/shards/shard_id=3")           # lost shard
    victim_dir = f"{my}/shards/shard_id=5"             # corrupted shard
    victim = sorted(f for f in os.listdir(victim_dir)
                    if f.endswith(".parquet"))[0]
    os.remove(os.path.join(victim_dir, victim))
    intact_files = {
        sid: sorted(os.listdir(f"{my}/shards/shard_id={sid}"))
        for sid in range(s["n_shards"]) if sid not in (3, 5)
    }
    intact_mtimes = {
        sid: [os.path.getmtime(f"{my}/shards/shard_id={sid}/{f}")
              for f in fs] for sid, fs in intact_files.items()
    }

    s2 = run_curation_job(spark, SF, my, resume=True)
    assert s2["n_shards_written"] == 2  # exactly the damaged shards
    # untouched shards: same files, same mtimes (not rewritten)
    for sid, fs in intact_files.items():
        assert sorted(os.listdir(f"{my}/shards/shard_id={sid}")) == fs
        assert [os.path.getmtime(f"{my}/shards/shard_id={sid}/{f}")
                for f in fs] == intact_mtimes[sid]
    # final manifest == the clean run's
    assert sorted(tuple(r) for r in
                  spark.read.parquet(f"{my}/manifest").collect()) == clean

    # fully-intact resume: verifies everything, writes nothing
    s3 = run_curation_job(spark, SF, my, resume=True)
    assert s3["n_shards_written"] == 0

    # layout change: resuming with a smaller --n-shards must fail fast
    # with the cause named (dynamic overwrite cannot delete the stale
    # shards; silently rewriting would strand them and fail the gate)
    with pytest.raises(ValueError, match="different --n-shards"):
        run_curation_job(spark, SF, my, n_shards=4, resume=True)


def test_chunks_cover_only_kept_train_docs(spark, job_out):
    out, s = job_out
    shard_docs = {r["doc_id"] for r in
                  spark.read.parquet(f"{out}/shards").select("doc_id")
                  .distinct().collect()}
    kept = {r["doc_id"] for r in spark.sql(
        "SELECT doc_id FROM kept_train").collect()}
    assert shard_docs <= kept
    # every kept doc with at least one token produces at least one chunk
    assert len(shard_docs) >= s["n_kept_train"] * 9 // 10
