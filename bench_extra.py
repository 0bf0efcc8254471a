"""Optimization-round measurement harness (bench.py is FROZEN for the
driver; this file is where iteration numbers come from — guide §1).

Times selected contract queries with the noop sink under EXACTLY the same
session shape as bench.py's query section (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=2*CPUS, persisted intermediates released between passes,
interleaved passes, min + median published), and dumps
`.explain("formatted")` plans for the plans/r08/ audit trail.

Usage:
  python bench_extra.py time  [--sf DIR] [--runs N] [query ...]
  python bench_extra.py plan  [--out DIR] [--sf DIR] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _args(argv):
    mode, sf, runs, out, names = argv[1], SF_DIR, 3, "plans/r08", []
    it = iter(argv[2:])
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--out":
            out = next(it)
        else:
            names.append(a)
    return mode, sf, runs, out, names


def main() -> None:
    mode, sf, runs, out, names = _args(sys.argv)
    from vlm_ocr_doc_reader_spark.contract import QUERIES, STAGED_QUERIES
    from vlm_ocr_doc_reader_spark.datapipe.cache import release_all_cached
    from vlm_ocr_doc_reader_spark.sources.session import get_spark
    lookup = {**STAGED_QUERIES, **QUERIES}
    if not names:
        names = sorted(lookup)
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-extra",
                      shuffle_partitions=2 * CPUS,
                      extra_conf={"spark.ui.enabled": "false"})
    try:
        if mode == "plan":
            os.makedirs(out, exist_ok=True)
            for name in names:
                df = lookup[name](spark, sf)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                path = os.path.join(out, f"{name}.txt")
                with open(path, "w") as f:
                    f.write(txt)
                print(f"wrote {path}")
                release_all_cached()
            return
        all_times: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(runs):
            for name in names:
                spark.sparkContext.setJobDescription(f"bench-extra: {name}")
                t0 = time.time()
                lookup[name](spark, sf).write.format("noop") \
                    .mode("overwrite").save()
                all_times[name].append(round(time.time() - t0, 3))
                release_all_cached()
        import statistics
        res = {n: {"min": min(ts), "median": round(statistics.median(ts), 3),
                   "times": ts} for n, ts in all_times.items()}
        print(json.dumps(res, indent=1))
        print(json.dumps({"total_min": round(
            sum(v["min"] for v in res.values()), 2)}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
