"""Round-6 measurement harness (guide §1): isolated per-query walls +
plan capture.  bench.py is FROZEN for the driver's measurement; this
tool exists so optimization work can time one query at a time (noop
sink, same session shape as bench.build_spark) and snapshot
``explain('formatted')`` into plans/r06/<query>_<tag>.txt.

Usage:
    python tools/r06_measure.py --names kg_linked,kg_canonical --repeat 2
    python tools/r06_measure.py --explain-all --tag before
    python tools/r06_measure.py --names kg_linked --jobs   # per-job walls
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402  (same session shape as the gate)


def _warm(spark):
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm_worker(it):
        import kgkit.ner_core  # noqa: F401

        return it

    width = spark.sparkContext.defaultParallelism * 2
    spark.range(width * 4).repartition(width).mapInPandas(
        _warm_worker, "id long"
    ).write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", action="store_true",
                    help="dump explain('formatted') for --names")
    ap.add_argument("--explain-all", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus, app="kgkit-r06-measure")
    spark.sparkContext.setLogLevel("ERROR")
    from kgkit.queries import QUERIES

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    names = [n for n in args.names.split(",") if n]
    if args.explain_all:
        names = list(QUERIES)

    if args.explain or args.explain_all:
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
        spark.stop()
        return

    if not args.no_warm:
        _warm(spark)
    out = {}
    for r in range(args.repeat):
        for name in names:
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.monotonic()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            wall = round(time.monotonic() - t0, 3)
            out.setdefault(name, []).append(wall)
            print(json.dumps({"q": name, "rep": r, "wall_s": wall}))
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
