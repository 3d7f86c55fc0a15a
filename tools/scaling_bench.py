"""Two-parallelism scaling evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north_rule's N->4N executor
criterion is evidenced by running the SAME job at local[8] and local[32] on
the SAME input (driver instruction). Each run is a fresh spark-submit (own
JVM); throughput excludes corpus generation; efficiency =
(tput_32 / tput_8) / 4, required >= 0.8.

    python tools/scaling_bench.py [--n-docs 4000] [--repeats 2]

Writes BENCH/scaling.json and prints a markdown table for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(corpus: str, cpus: int, tag: str) -> dict:
    out_dir = f"/tmp/t2p_scale_{tag}_{cpus}"
    subprocess.run(["rm", "-rf", out_dir], check=True)
    cmd = [
        "spark-submit", "--master", f"local[{cpus}]",
        "--driver-memory", "24g",
        os.path.join(REPO, "jobs", "extract.py"),
        "--input", corpus,
        "--output", f"{out_dir}/out",
        "--metrics", f"{out_dir}/metrics",
        "--run-id", f"scale-{cpus}-{tag}",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False)
    m = re.search(
        r"extract run_id=\S+ docs=(\d+) ok=(\d+) quarantined=(\d+) "
        r"spans=(\d+) wall=([\d.]+)s throughput=([\d.]+)",
        proc.stdout,
    )
    if not m:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        raise SystemExit(f"no summary line from local[{cpus}]")
    return {
        "cpus": cpus, "docs": int(m.group(1)), "ok": int(m.group(2)),
        "quarantined": int(m.group(3)), "spans": int(m.group(4)),
        "wall_sec": float(m.group(5)), "docs_per_sec": float(m.group(6)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=4000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    corpus = f"/tmp/t2p_bench_corpus_{args.n_docs}_42"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_corpus.py"),
             "--out", corpus, "--n-docs", str(args.n_docs)],
            check=True,
        )

    results = {8: [], 32: []}
    for rep in range(args.repeats):
        for cpus in (8, 32):
            r = run_once(corpus, cpus, f"r{rep}")
            results[cpus].append(r)
            print(f"local[{cpus}] rep{rep}: wall={r['wall_sec']}s "
                  f"tput={r['docs_per_sec']} docs/s")

    best8 = max(r["docs_per_sec"] for r in results[8])
    best32 = max(r["docs_per_sec"] for r in results[32])
    eff = (best32 / best8) / 4
    summary = {
        "n_docs": args.n_docs,
        "local8_docs_per_sec": best8,
        "local32_docs_per_sec": best32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
        "runs": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))
    print(f"\n| parallelism | best docs/s | wall (best) |")
    print(f"|---|---|---|")
    for cpus in (8, 32):
        best = max(results[cpus], key=lambda r: r["docs_per_sec"])
        print(f"| local[{cpus}] | {best['docs_per_sec']} | {best['wall_sec']}s |")
    print(f"\nefficiency (tput32/tput8)/4 = {eff:.3f} "
          f"({'PASS' if eff >= 0.8 else 'FAIL'} >= 0.8)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
