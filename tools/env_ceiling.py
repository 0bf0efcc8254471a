"""Environment scaling ceiling probe: a pure-CPU mapInPandas stage
(hashlib loop — no I/O, no engine code) run at local[2] vs local[8]
with the same interleaved protocol as bench.py's scaling levels.

Whatever efficiency THIS prints is the best any 2->8-core pair can do
on this host right now: it bounds the engine's measured scaling from
above, so when the engine reads lower than its historical number the
probe separates "the box moved" from "the code regressed".  (r5 on
this VM: probe 0.877, engine 0.861 — at ceiling.)

Usage: python tools/env_ceiling.py [rows_per_task] [rounds]
"""
import statistics
import sys
import time

sys.path.insert(0, ".")

from vlm_ocr_doc_reader_spark.sources.session import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_TASKS = 64  # divisible by both levels; ~2x the wide level's cores


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


def run(master: str) -> float:
    spark = get_spark(master=master, app_name=f"ceiling-{master}",
                      extra_conf={"spark.ui.enabled": "false"})
    try:
        df = spark.range(ROWS).repartition(N_TASKS)
        t0 = time.time()
        df.mapInPandas(_burn, "h string").write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0
    finally:
        spark.stop()


def main() -> None:
    levels = {"local[2]": [], "local[8]": []}
    for r in range(ROUNDS):
        for m in levels:
            dt = run(m)
            levels[m].append(round(dt, 2))
            print(f"round {r} {m}: {dt:.2f}s", flush=True)
    tl, th = levels["local[2]"], levels["local[8]"]
    eff_min = (min(tl) / min(th)) / 4
    paired = sorted((a / b) / 4 for a, b in zip(tl, th))
    print(f"lo times: {tl}")
    print(f"hi times: {th}")
    print(f"ceiling efficiency (min-based): {eff_min:.3f}")
    print(f"ceiling efficiency (paired median): "
          f"{statistics.median(paired):.3f}")


if __name__ == "__main__":
    main()
