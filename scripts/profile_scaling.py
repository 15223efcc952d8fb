#!/usr/bin/env python
"""Per-stage strong-scaling profile: run the full pipeline at two
parallelism levels (fresh subprocess each) on identical synthetic input
and print the per-phase walls + speedups. Usage:

    python scripts/profile_scaling.py [N_DOCS] [LO] [HI]

Each level runs in its own process (fresh JVM + python worker pool).
"""

from __future__ import annotations

import json
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32

_ONE = r"""
import json, shutil, sys, tempfile, time
from remine_spark.session import get_spark
from remine_spark import pipeline, synth
n = int(sys.argv[1]); docs = int(sys.argv[2])
spark = get_spark(master=f"local[{n}]", app_name=f"profile_{n}")
wd = tempfile.mkdtemp(prefix="remine_prof_")
try:
    pages = synth.pages_df(spark, docs, seed=42, num_partitions=64).cache()
    n_en = pages.filter("lang = 'en'").count()
    t0 = time.time()
    out = pipeline.run_pipeline(spark, pages, wd, inner_iters=2,
                                transe_epochs=3, resume=False)
    out["triples"].count()
    wall = time.time() - t0
    print("RESULT " + json.dumps({
        "cores": n, "docs": n_en, "wall": round(wall, 2),
        "docs_per_sec": round(n_en / wall, 2),
        "timings": out["timings"]}))
finally:
    shutil.rmtree(wd, ignore_errors=True)
spark.stop()
"""


def run_one(n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _ONE, str(n), str(N_DOCS)],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    lo, hi = run_one(LO), run_one(HI)
    ratio = hi["cores"] / lo["cores"]
    print(f"\n{'phase':<16} {'@' + str(LO):>9} {'@' + str(HI):>9} "
          f"{'speedup':>8} (ideal {ratio:.0f}x)")
    for k in lo["timings"]:
        a, b = lo["timings"][k], hi["timings"].get(k, float('nan'))
        sp = a / b if b else float("nan")
        print(f"{k:<16} {a:>8.1f}s {b:>8.1f}s {sp:>7.2f}x")
    print(f"{'TOTAL':<16} {lo['wall']:>8.1f}s {hi['wall']:>8.1f}s "
          f"{lo['wall'] / hi['wall']:>7.2f}x")
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    print(json.dumps({
        "docs": N_DOCS,
        f"local{LO}_docs_per_sec": lo["docs_per_sec"],
        f"local{HI}_docs_per_sec": hi["docs_per_sec"],
        "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
