"""Dump .explain('formatted') for every registered query (no execution).

Usage: python tools/dump_plans.py OUT_DIR [SUFFIX] [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt (default suffix: before). Plans are
captured lazily — the query function builds its DataFrame against
$SPARK_GRAFT_SF_DIR (default sf0.1) and we print the formatted plan;
nothing is executed, so this is cheap enough to run for all 300+ queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as ent
    from speech_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_dump")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = ent.queries()
    n_ok = n_err = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(path, "w") as f:
                f.write(plan)
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            n_err += 1
        finally:
            # some operators run eager driver loops with persist();
            # drop anything they left behind so plans stay independent
            spark.catalog.clearCache()
    print(f"wrote {n_ok} plans to {out_dir} ({n_err} errors)")
    return 0 if n_err == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
