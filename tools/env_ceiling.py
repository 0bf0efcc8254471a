"""Environment scaling ceiling probe: a pure-CPU mapInPandas stage
(hashlib loop — no I/O, no engine code) run at local[2] vs local[8]
with the same interleaved protocol as bench.py's scaling levels.

Whatever efficiency THIS prints is the best any 2->8-core pair can do
on this host right now: it bounds the engine's measured scaling from
above, so when the engine reads lower than its historical number the
probe separates "the box moved" from "the code regressed".  (r5 on
this VM: probe 0.877, engine 0.861 — at ceiling.  r6: probe 0.800 /
0.830 paired, engine 0.709 published — but the probe was not run
adjacent to the final bench pass, so the record could not fully
exonerate the engine; from r7 bench.py calls ``probe()`` immediately
before AND after the scaling passes and publishes both samples in the
parsed JSON line.)

Usage: python tools/env_ceiling.py [rows_per_task] [rounds]
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

from vlm_ocr_doc_reader_spark.sources.session import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 and __name__ == "__main__" \
    else 4000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 and __name__ == "__main__" \
    else 4
N_TASKS = 64  # divisible by both levels; ~2x the wide level's cores


def _make_burn():
    # defined as a CLOSURE so cloudpickle ships it by value: executors
    # cannot import tools/env_ceiling when bench.py imports this module
    def _burn(iterator):
        import hashlib

        import pandas as pd
        for pdf in iterator:
            out = []
            for seed in pdf["id"]:
                h = hashlib.sha256(str(seed).encode())
                for _ in range(20_000):
                    h = hashlib.sha256(h.digest())
                out.append(h.hexdigest())
            yield pd.DataFrame({"h": out})
    return _burn


def run(master: str, rows: int = ROWS) -> float:
    spark = get_spark(master=master, app_name=f"ceiling-{master}",
                      extra_conf={"spark.ui.enabled": "false"})
    try:
        df = spark.range(rows).repartition(N_TASKS)
        t0 = time.time()
        df.mapInPandas(_make_burn(), "h string").write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0
    finally:
        spark.stop()


def probe(rounds: int = 4, rows: int = ROWS, log=print) -> dict:
    """One full interleaved ceiling measurement; importable by bench.py
    so the probe runs ADJACENT to the scaling passes it judges.
    Returns both estimators plus the raw per-round times."""
    levels = {"local[2]": [], "local[8]": []}
    for r in range(rounds):
        for m in levels:
            dt = run(m, rows)
            levels[m].append(round(dt, 2))
            log(f"probe round {r} {m}: {dt:.2f}s")
    tl, th = levels["local[2]"], levels["local[8]"]
    paired = sorted((a / b) / 4 for a, b in zip(tl, th))
    return {
        "lo_times": tl,
        "hi_times": th,
        "efficiency_min": round((min(tl) / min(th)) / 4, 3),
        "efficiency_paired_median": round(statistics.median(paired), 3),
    }


def main() -> None:
    r = probe(ROUNDS, ROWS)
    print(f"lo times: {r['lo_times']}")
    print(f"hi times: {r['hi_times']}")
    print(f"ceiling efficiency (min-based): {r['efficiency_min']:.3f}")
    print(f"ceiling efficiency (paired median): "
          f"{r['efficiency_paired_median']:.3f}")


if __name__ == "__main__":
    main()
