"""Repo-local stress-data generator (VERDICT r3, next-round item #1).

Produces an sf1-equivalent dataset (10x the driver's sf0.1) plus a
skewed variant, mirroring TESTDATA.md's schemas exactly so every
registry query runs unmodified:

    python tools/gen_scale.py --out stress_data/sf1 --scale 10
    python tools/gen_scale.py --out stress_data/sf1skew --scale 10 --skew

Writes ONLY under the repo (never touches /root/testdata — that data is
driver-owned and read-only). `region`/`nation` are fixed-size dims and
are copied verbatim from the base dir; every other table is generated
distributed-and-deterministic: each column is a pure function of the
row id via xxhash64(id, salt), so the same (scale, seed) always yields
byte-stable values with NO driver-side row loop and no Python RNG —
generation itself is an executor-parallel Spark job, the same shape it
would take producing 100 TB on a real cluster.

Skew variant (--skew): one hot key at ~20% of rows in each fact table —
events.user_id=7, orders.o_custkey=7, lineitem.l_suppkey=7, one shared
document text cluster, one dense embedding cluster — exercising AQE
skew-join splitting and salted/blocked operator paths.

Schemas + value ranges mirror /root/testdata/sf0.1 (probed 2026-08-14):
see TESTDATA.md and the column comments below.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sf0.1 row counts; generated tables scale linearly from these.
BASE_ROWS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

SEED = 42
HOT_KEY = 7  # the skewed variant's hot id (user/cust/supp)
HOT_FRAC = 0.20

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETFLAGS = ["N", "A", "R"]
LINESTATUS = ["O", "F"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
ADJECTIVES = ["large", "hot", "blue", "small", "green", "red", "cold", "light", "dark", "heavy"]
NOUNS = ["ring", "bolt", "screw", "nut", "washer", "gear", "wheel", "pin", "rod", "cap"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]
EMB_DIM = 64
N_LABELS = 10


def _h(col, salt: int):
    """Deterministic 63-bit non-negative hash of a column + salt."""
    return F.abs(F.xxhash64(col, F.lit(SEED), F.lit(salt)))


def _u(col, salt: int, mod: int):
    """Deterministic uniform integer in [0, mod)."""
    return F.pmod(_h(col, salt), F.lit(mod))


def _uf(col, salt: int):
    """Deterministic uniform double in [0, 1)."""
    return _u(col, salt, 1_000_000).cast("double") / F.lit(1_000_000.0)


def _pick(col, salt: int, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_u(col, salt, len(values)) + 1).cast("int"))


def _ts(base: str, col_days):
    """TIMESTAMP_NTZ at `base` + col_days (fractional days ok via micros)."""
    micros = (col_days * F.lit(86_400_000_000.0)).cast("long")
    return F.expr(f"TIMESTAMP_NTZ '{base}'") + F.make_interval(
        secs=micros.cast("double") / F.lit(1_000_000.0)
    )


def _range(spark: SparkSession, n: int, parts: int = 32) -> DataFrame:
    return spark.range(0, n, 1, parts)


def gen_customer(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    return _range(spark, n).select(
        i.alias("c_custkey"),
        F.format_string("Customer#%09d", i).alias("c_name"),
        _u(i, 1, 25).cast("int").alias("c_nationkey"),
        F.round(F.lit(-1000.0) + _uf(i, 2) * F.lit(11000.0), 2).alias("c_acctbal"),
        _pick(i, 3, SEGMENTS).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    return _range(spark, n).select(
        i.alias("s_suppkey"),
        F.format_string("Supplier#%09d", i).alias("s_name"),
        _u(i, 4, 25).cast("int").alias("s_nationkey"),
        F.round(F.lit(-1000.0) + _uf(i, 5) * F.lit(11000.0), 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    return _range(spark, n).select(
        i.alias("p_partkey"),
        F.concat_ws(" ", _pick(i, 6, ADJECTIVES), _pick(i, 7, NOUNS)).alias("p_name"),
        F.concat(F.lit("Brand#"), _u(i, 8, 25).cast("string")).alias("p_brand"),
        _pick(i, 9, PTYPES).alias("p_type"),
        (_u(i, 10, 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + _uf(i, 11) * F.lit(1100.0), 2).alias("p_retailprice"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int, skew: bool) -> DataFrame:
    i = F.col("id")
    custkey = _u(i, 12, n_cust)
    if skew:
        custkey = F.when(_uf(i, 13) < F.lit(HOT_FRAC), F.lit(HOT_KEY)).otherwise(custkey)
    # o_orderdate uniform over 1995-01-01 .. 2001-08-01 (~2404 days)
    return _range(spark, n).select(
        i.alias("o_orderkey"),
        custkey.cast("long").alias("o_custkey"),
        _pick(i, 14, STATUSES).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _uf(i, 15) * F.lit(499000.0), 2).alias("o_totalprice"),
        _ts("1995-01-01 00:00:00", _u(i, 16, 2404).cast("double")).alias("o_orderdate"),
        _pick(i, 17, PRIORITIES).alias("o_orderpriority"),
    )


def gen_lineitem(
    spark: SparkSession, n: int, n_orders: int, n_part: int, n_supp: int, skew: bool
) -> DataFrame:
    i = F.col("id")
    # ~4 lines per order, linenumber dense within the order.
    orderkey = (i / F.lit(4)).cast("long")
    suppkey = _u(i, 20, n_supp)
    if skew:
        suppkey = F.when(_uf(i, 21) < F.lit(HOT_FRAC), F.lit(HOT_KEY)).otherwise(suppkey)
    qty = (_u(i, 22, 50) + 1).cast("double")
    price = F.round(F.lit(900.0) + _uf(i, 23) * F.lit(104100.0), 2)
    return _range(spark, n, 64).select(
        orderkey.alias("l_orderkey"),
        _u(i, 24, n_part).cast("long").alias("l_partkey"),
        suppkey.cast("long").alias("l_suppkey"),
        (F.pmod(i, F.lit(4)) + 1).cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        price.alias("l_extendedprice"),
        (F.round(_uf(i, 25) * F.lit(0.10), 2)).alias("l_discount"),
        (F.round(_uf(i, 26) * F.lit(0.08), 2)).alias("l_tax"),
        _pick(i, 27, RETFLAGS).alias("l_returnflag"),
        _pick(i, 28, LINESTATUS).alias("l_linestatus"),
        _ts("1995-01-02 00:00:00", _u(i, 29, 2490).cast("double")).alias("l_shipdate"),
    ).filter(F.col("l_orderkey") < n_orders)


def gen_events(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    n_users = max(1, n // 67)  # sf0.1: 100k events over 1500 users
    user = _u(i, 30, n_users)
    if skew:
        user = F.when(_uf(i, 31) < F.lit(HOT_FRAC), F.lit(HOT_KEY)).otherwise(user)
    # ts monotone in event_id over 30 days with per-row jitter (mirrors the
    # driver data: sorted by event_id, ~26s mean gap at sf0.1).
    span_days = 30.0
    frac_days = (i.cast("double") + _uf(i, 32)) * F.lit(span_days) / F.lit(float(n))
    return _range(spark, n, 64).select(
        i.alias("event_id"),
        _ts("2024-01-01 00:00:00", frac_days).alias("ts"),
        user.cast("long").alias("user_id"),
        _pick(i, 33, EVENT_TYPES).alias("event_type"),
        F.round(_uf(i, 34) * F.lit(560.0), 2).alias("value"),
        F.concat(F.lit('{"k": '), _u(i, 35, 100).cast("string"), F.lit("}")).alias(
            "props"
        ),
    )


def gen_documents(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    # Planted duplication: ~0.4% of docs share a text seed in groups of
    # ~up-to-8 (exact + near dups for dedup/LSH operators). Skew variant:
    # a full 20% of the corpus collapses onto ONE text seed — a massive
    # near-dup cluster that stresses LSH band buckets and dedup groupBys.
    group_seed = (i - F.pmod(i, F.lit(8))).cast("long")
    is_dup = _uf(i, 36) < F.lit(0.05)
    seed = F.when(is_dup, group_seed).otherwise(i)
    if skew:
        seed = F.when(_uf(i, 37) < F.lit(HOT_FRAC), F.lit(0).cast("long")).otherwise(seed)
    n_words = (_u(seed, 38, 91) + 10).cast("int")  # 10..100 words
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda k: F.element_at(
            vocab, (F.pmod(F.abs(F.xxhash64(seed, k, F.lit(SEED))), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    # Near-dup edit: half the planted dups get one extra word appended, so
    # LSH has true near- (not only exact-) duplicates to find.
    text = F.array_join(words, " ")
    text = F.when(
        is_dup & (F.pmod(i, F.lit(2)) == 1), F.concat(text, F.lit(" "), _pick(i, 39, VOCAB))
    ).otherwise(text)
    return _range(spark, n).select(
        i.alias("doc_id"),
        text.alias("text"),
        _pick(i, 40, LANGS).alias("lang"),
        F.concat(F.lit("src"), _u(i, 41, 20).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, skew: bool) -> DataFrame:
    i = F.col("id")
    label = _u(i, 42, N_LABELS)
    if skew:
        label = F.when(_uf(i, 43) < F.lit(HOT_FRAC), F.lit(0).cast("long")).otherwise(label)
    # centroid[label][d] in [-1,1); point = centroid + 0.3*noise; unit-norm.
    dims = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    raw = F.transform(
        dims,
        lambda d: (
            F.pmod(F.abs(F.xxhash64(label, d, F.lit(SEED + 1))), F.lit(1_000_000)).cast("double")
            / F.lit(500_000.0)
            - F.lit(1.0)
        )
        + F.lit(0.3)
        * (
            F.pmod(F.abs(F.xxhash64(i, d, F.lit(SEED + 2))), F.lit(1_000_000)).cast("double")
            / F.lit(500_000.0)
            - F.lit(1.0)
        ),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.transform(raw, lambda x: (x / norm).cast("float"))
    return _range(spark, n).select(
        i.alias("vec_id"),
        unit.alias("embedding"),
        label.cast("int").alias("label"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output dir (repo-local)")
    ap.add_argument("--scale", type=float, default=10.0, help="multiplier vs sf0.1")
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--base", default="/root/testdata/sf0.1", help="dir to copy fixed dims from")
    ap.add_argument(
        "--tables",
        default="",
        help="comma-separated subset of fact tables to generate "
        "(default: all). Dims (region/nation) are always copied. "
        "Used for the sf10 spot-bench, which only needs "
        "events/documents/embeddings.",
    )
    args = ap.parse_args()
    only = {t.strip() for t in args.tables.split(",") if t.strip()}

    out = os.path.abspath(args.out)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not out.startswith(repo):
        raise SystemExit(f"refusing to write outside the repo: {out}")
    os.makedirs(out, exist_ok=True)

    from speech_data_pipeline_spark.session import get_spark

    spark = get_spark("gen_scale")

    rows = {t: int(c * args.scale) for t, c in BASE_ROWS.items()}

    def write(df: DataFrame, name: str) -> None:
        # Single parquet FILE per table (catalog reads `{dir}/{name}.parquet`
        # as a path — a file locally, a partitioned dir at scale).
        tmp = os.path.join(out, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), os.path.join(out, f"{name}.parquet"))
        import shutil

        shutil.rmtree(tmp)
        print(f"  {name}: {rows.get(name, '?')} rows -> {out}/{name}.parquet")

    for dim in ("region", "nation"):
        spark.read.parquet(os.path.join(args.base, f"{dim}.parquet")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"_tmp_{dim}"))
        tmp = os.path.join(out, f"_tmp_{dim}")
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), os.path.join(out, f"{dim}.parquet"))
        import shutil

        shutil.rmtree(tmp)

    def want(name: str) -> bool:
        return not only or name in only

    if want("customer"):
        write(gen_customer(spark, rows["customer"], args.skew), "customer")
    if want("supplier"):
        write(gen_supplier(spark, rows["supplier"], args.skew), "supplier")
    if want("part"):
        write(gen_part(spark, rows["part"], args.skew), "part")
    if want("orders"):
        write(gen_orders(spark, rows["orders"], rows["customer"], args.skew), "orders")
    if want("lineitem"):
        write(
            gen_lineitem(
                spark, rows["lineitem"], rows["orders"], rows["part"], rows["supplier"], args.skew
            ),
            "lineitem",
        )
    if want("events"):
        write(gen_events(spark, rows["events"], args.skew), "events")
    if want("documents"):
        write(gen_documents(spark, rows["documents"], args.skew), "documents")
    if want("embeddings"):
        write(gen_embeddings(spark, rows["embeddings"], args.skew), "embeddings")
    print(f"done: {out} (scale={args.scale}, skew={args.skew})")


if __name__ == "__main__":
    main()
