"""Per-phase scaling attribution (r3 VERDICT #3).

The r3 scaling evidence showed job/control normalized efficiency moving
0.941 -> 0.850; the verdict asked WHICH phase's serial/contended share
grows from local[N] to local[4N], answered with data. There is no clean
in-job phase timer (scan -> kernel -> write is ONE fused Spark stage by
design), so phases are isolated DIFFERENTIALLY with four job variants on
the same corpus, same pinned cores, same warm page cache:

    scan_only     = scan + payload assembly            (jobs/extract.py --scan-only)
    compute_only  = scan + assembly + kernel + Arrow   (--compute-only)
    no_metrics    = ... + partitioned parquet write    (--no-metrics)
    full          = ... + durable read-back metrics + commit

    read    = scan_only
    kernel  = compute_only - scan_only
    write   = no_metrics - compute_only
    metrics = full - no_metrics

Each pair interleaves all four variants at both parallelisms (shared
noise window, scaling_bench protocol: taskset pinning, pre-touched page
cache, per-run output cleanup). Per-phase N->4N efficiency and per-phase
share of full wall are reported; medians accumulate over pairs via
--jsonl like scaling_bench.

    python tools/phase_bench.py [--n-docs 64000] [--repeats 1] [--n 4]
        [--jsonl /tmp/phases.jsonl]

Writes BENCH/phases.json and prints a markdown table for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "scan_only": ["--scan-only"],
    "compute_only": ["--compute-only"],
    "no_metrics": ["--no-metrics"],
    "full": [],
}
PHASES = ["read", "kernel", "write", "metrics"]


def run_variant(corpus: str, cpus: int, tag: str, extra: list,
                variant: str = "full") -> float:
    out_dir = f"/tmp/t2p_phase_{tag}_{cpus}"
    subprocess.run(["rm", "-rf", out_dir], check=True)
    subprocess.run(
        f"cat {corpus}/*/*.parquet > /dev/null 2>&1 || "
        f"cat {corpus}/*.parquet > /dev/null 2>&1 || true",
        shell=True, check=False,
    )
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        "spark-submit", "--master", f"local[{cpus}]",
        "--driver-memory", "16g",
        os.path.join(REPO, "jobs", "extract.py"),
        "--input", corpus,
        "--output", f"{out_dir}/out",
        "--metrics", f"{out_dir}/metrics",
        "--run-id", f"phase-{cpus}-{tag}",
        "--prewarm",
        "--max-partition-bytes", "16m",
    ] + extra
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False)
    # match the VARIANT-TAGGED summary line only (r4 ADVICE): a scan-only
    # or no-metrics wall must never be ingested as a full-job figure, and
    # vice versa — the job prints `extract[variant] ...` for partial
    # variants and plain `extract ...` for the real job.
    head = r"extract run_id=" if variant == "full" \
        else rf"extract\[{variant}\] run_id="
    m = re.search(head + r"\S*.*?wall=([\d.]+)s", proc.stdout)
    if not m:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        raise SystemExit(
            f"no `{variant}` summary line from local[{cpus}] {extra}")
    subprocess.run(["rm", "-rf", out_dir], check=True)
    return float(m.group(1))


def phase_walls(variant_walls: dict) -> dict:
    """Differential phase attribution; floors at 0.01s (host noise can
    make a cheap variant pair invert by tens of ms)."""
    v = variant_walls
    return {
        "read": v["scan_only"],
        "kernel": max(0.01, v["compute_only"] - v["scan_only"]),
        "write": max(0.01, v["no_metrics"] - v["compute_only"]),
        "metrics": max(0.01, v["full"] - v["no_metrics"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=64000)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    corpus = f"/tmp/t2p_bench_corpus_{args.n_docs}_42"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_corpus.py"),
             "--out", corpus, "--n-docs", str(args.n_docs)],
            check=True,
        )

    lo, hi = args.n, args.n * 4
    pairs = []
    for rep in range(args.repeats):
        rec = {}
        for cpus in (lo, hi):
            walls = {}
            for name, extra in VARIANTS.items():
                walls[name] = run_variant(corpus, cpus, f"r{rep}", extra,
                                          variant=name)
                print(f"local[{cpus}] {name}: {walls[name]}s", flush=True)
            rec[str(cpus)] = {"variants": walls, "phases": phase_walls(walls)}
        pairs.append(rec)
        if args.jsonl:
            with open(args.jsonl, "a") as f:
                f.write(json.dumps(rec) + "\n")

    if args.jsonl:
        pairs = [json.loads(line) for line in open(args.jsonl)]

    def med(cpus, phase):
        return statistics.median(p[str(cpus)]["phases"][phase]
                                 for p in pairs)

    summary = {"n_docs": args.n_docs, "n": lo, "4n": hi,
               "n_pairs": len(pairs), "pairs": pairs, "phase_medians": {}}
    print(f"\n{len(pairs)} pairs, medians:\n")
    print("| phase | local[%d] s | local[%d] s | share@%d | share@%d | "
          "phase efficiency |" % (lo, hi, lo, hi))
    print("|---|---|---|---|---|---|")
    full_lo = statistics.median(
        p[str(lo)]["variants"]["full"] for p in pairs)
    full_hi = statistics.median(
        p[str(hi)]["variants"]["full"] for p in pairs)
    for ph in PHASES:
        wlo, whi = med(lo, ph), med(hi, ph)
        eff = (wlo / whi) / (hi // lo)
        # per-pair spread alongside the median (r4 ADVICE): differential
        # attribution is noise-dominated for the small phases — a reader
        # must see when the range exceeds the phase size before trusting
        # a per-phase conclusion
        rng_lo = [p[str(lo)]["phases"][ph] for p in pairs]
        rng_hi = [p[str(hi)]["phases"][ph] for p in pairs]
        summary["phase_medians"][ph] = {
            "lo_sec": wlo, "hi_sec": whi,
            "lo_range": [min(rng_lo), max(rng_lo)],
            "hi_range": [min(rng_hi), max(rng_hi)],
            "share_lo": round(wlo / full_lo, 3),
            "share_hi": round(whi / full_hi, 3),
            "efficiency": round(eff, 3),
            "noise_dominated": (max(rng_lo) - min(rng_lo) > wlo
                                or max(rng_hi) - min(rng_hi) > whi),
        }
        print(f"| {ph} | {wlo:.1f} ({min(rng_lo):.1f}-{max(rng_lo):.1f}) "
              f"| {whi:.1f} ({min(rng_hi):.1f}-{max(rng_hi):.1f}) "
              f"| {wlo / full_lo:.0%} "
              f"| {whi / full_hi:.0%} | {eff:.3f} |")
    print(f"| full | {full_lo:.1f} | {full_hi:.1f} | 100% | 100% | "
          f"{(full_lo / full_hi) / (hi // lo):.3f} |")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "phases.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
