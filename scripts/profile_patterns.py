#!/usr/bin/env python
"""Sub-stage profile of the patterns stage (the worst 8→32 scaler,
BENCH.md: 1.39×): times mine / boost / quality / checkpoint-write
separately at two parallelism levels on an identical materialized
sentences checkpoint. Usage:

    python scripts/profile_patterns.py [N_DOCS] [LO] [HI]

The sentences checkpoint is built ONCE (at HI parallelism) and re-read by
both levels, so the numbers isolate the patterns stage exactly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32
WD = sys.argv[4] if len(sys.argv) > 4 else None

_PREP = r"""
import sys
from remine_spark.session import get_spark
from remine_spark import pipeline, synth
from remine_spark.corpus import sentences_from_pages
docs, wd = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name="prep")
pages = synth.pages_df(spark, docs, seed=42, num_partitions=64)
pipeline.checkpoint(spark, wd, "sentences", sentences_from_pages(pages),
                    resume=True)
print("PREP done")
spark.stop()
"""

_ONE = r"""
import json, sys, time
from pyspark.sql import functions as F
from remine_spark.session import get_spark
from remine_spark import mining, model as model_mod, pipeline
n, wd = int(sys.argv[1]), sys.argv[2]
spark = get_spark(master=f"local[{n}]", app_name=f"prof_patterns_{n}")
sentences = pipeline._read_wide(spark, wd + "/sentences")
t = {}

t0 = time.time()
mined = mining.mine_patterns(sentences)
n_mined = mined.count()
t["mine"] = round(time.time() - t0, 2)

t0 = time.time()
boost = mining.boost_patterns(sentences)
n_boost = boost.count()
t["boost"] = round(time.time() - t0, 2)

t0 = time.time()
full = mining.mine_patterns_boosted(sentences)
scored = model_mod.assign_quality(full)
n_scored = scored.count()
t["boosted_union_quality"] = round(time.time() - t0, 2)

t0 = time.time()
scored.write.mode("overwrite").parquet(wd + f"/patterns_{n}")
t["write"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps({
    "cores": n, "mined": n_mined, "boost": n_boost, "scored": n_scored,
    "timings": t}))
spark.stop()
"""


def main() -> None:
    wd = WD or tempfile.mkdtemp(prefix="remine_patprof_")
    if not os.path.exists(os.path.join(wd, "sentences", "_SUCCESS")):
        subprocess.run([sys.executable, "-c", _PREP, str(N_DOCS), wd],
                       check=True)
    res = {}
    for n in (LO, HI):
        out = subprocess.run([sys.executable, "-c", _ONE, str(n), wd],
                             capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        res[n] = json.loads(line[len("RESULT "):])
        print(json.dumps(res[n]))
    lo, hi = res[LO], res[HI]
    ratio = HI / LO
    print(f"\n{'substage':<24} {'@' + str(LO):>8} {'@' + str(HI):>8} "
          f"{'speedup':>8} (ideal {ratio:.0f}x)")
    for k in lo["timings"]:
        a, b = lo["timings"][k], hi["timings"][k]
        sp = a / b if b else float("nan")
        print(f"{k:<24} {a:>8.2f} {b:>8.2f} {sp:>7.2f}x")
    print("workdir:", wd)


if __name__ == "__main__":
    main()
