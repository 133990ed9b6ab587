"""Edit-distance fuzzy matching: dictionary-encoded PassJoin candidate
generation + levenshtein verify.

Complements the token/shingle near-dup family in ``dedup.py`` with the
character-level measure ClickHouse exposes as
``editDistance``/``levenshteinDistance`` — the right tool for
short-string entity resolution (product names, titles) where token
Jaccard is too coarse.

Scale design, in order of leverage:

1. **Dictionary-encode first.**  String attributes repeat heavily
   (here: 20k parts share 64 distinct names; real catalogs behave the
   same).  All matching runs on DISTINCT ``(brand, name)`` — the
   brute-force blocked join was ~16M levenshtein calls at sf0.1, the
   distinct-level workload is ~10³ — then results expand back to key
   pairs with two equi-joins.  Robust to 100×: the distinct-name set
   grows sublinearly with rows.
2. **Segment pigeonhole (PassJoin, Li et al., VLDB 2011)** for the
   distinct-level candidates: split each name into k+1 = 3 segments;
   any pair within edit distance k = 2 must contain one segment
   *exactly* (shifted ≤ k, lengths differing ≤ k).  Probe side emits 3
   ``(segno, segment)`` keys per name; index side emits the shifted
   same-length substrings for each assumed probe length ``L±2`` (≤ 75
   keys, deduped); candidates come from an equi-join on
   ``(brand, la, segno, segment)`` — tiny buckets, no all-pairs scan
   even over the distinct names.
3. **Verify** the deduped candidates with one levenshtein each, then
   expand: same-name groups yield distance-0 key pairs, cross-name
   matches yield the cross product of their key groups.

The DuckDB oracle stays the *brute-force* definition over all part
pairs, so the gate proves the whole pipeline loses no pairs.  All
stages are Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

MAX_DIST = 2
_NSEG = MAX_DIST + 1

#: broadcast-gate statistics memo: input key → (distinct-name count,
#: avg name length).  Immutable-input statistics, so first-call-only
#: cost (see q_fuzzy_part_pairs).
_NAME_STATS: dict[str, tuple[int, float]] = {}


def _stats_key(sf_dir: str) -> str | None:
    """Memo key for the part table's gate statistics: path + mtime +
    size, so a REGENERATED dataset at the same path invalidates the
    entry instead of reusing a stale (possibly tiny) estimate
    (code-review r12c: a stale under-estimate re-opens the
    broadcast-OOM path the gate exists to close)."""
    import os

    path = f"{sf_dir}/part.parquet"
    try:
        st = os.stat(path)
        return f"{path}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return None  # unknown layout: skip the memo, re-estimate


def _broadcast_threshold_bytes(spark: SparkSession) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes (the gate for
    the PassJoin probe-leg hint, ADVICE r11).  ``-1`` (broadcast off)
    gates the hint off too; unit-suffixed values parse the way Spark
    does (b/k/m/g, case-insensitive, optional trailing 'b')."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    ).strip().lower()
    try:
        import re as _re

        m = _re.fullmatch(r"(-?\d+)\s*([kmgt]?)b?", raw)
        if not m:
            return 10 * 1024 * 1024
        n = int(m.group(1))
        mult = {"": 1, "k": 1024, "m": 1024**2,
                "g": 1024**3, "t": 1024**4}[m.group(2)]
        return n * mult if n >= 0 else 0
    except Exception:
        return 10 * 1024 * 1024


def _name_pairs(names: DataFrame, stats_key: str | None = None) -> DataFrame:
    """PassJoin over distinct ``(brand, name, L)`` rows: unordered
    distinct-name pairs within MAX_DIST, as (brand, name_a, name_b,
    dist) with name_a < name_b.  ``stats_key`` memoizes the broadcast
    gate's size estimate per immutable input (see _NAME_STATS)."""
    base = (F.col("la") / F.lit(_NSEG)).cast("int")
    rem = F.col("la") % F.lit(_NSEG)

    seg_structs = []
    for i in range(_NSEG):
        b_i = (F.col("L") / F.lit(_NSEG)).cast("int")
        r_i = F.col("L") % F.lit(_NSEG)
        li = b_i + F.when(F.lit(i) < r_i, 1).otherwise(0)
        si = F.lit(i) * b_i + F.least(F.lit(i), r_i)
        seg_structs.append(
            F.struct(
                F.lit(i).alias("segno"),
                F.col("name").substr(si + 1, li).alias("seg"),
            )
        )
    a = names.select(
        "brand",
        F.col("L").alias("la"),
        F.col("name").alias("name_a"),
        F.explode(F.array(*seg_structs)).alias("s"),
    ).select("brand", "la", "name_a", "s.segno", "s.seg")

    combos = F.array(
        *[
            F.struct(
                F.lit(dl).alias("dl"),
                F.lit(i).alias("segno"),
                F.lit(d).alias("d"),
            )
            for dl in range(-MAX_DIST, MAX_DIST + 1)
            for i in range(_NSEG)
            for d in range(-MAX_DIST, MAX_DIST + 1)
        ]
    )
    li = base + F.when(F.col("c.segno") < rem, 1).otherwise(0)
    si = F.col("c.segno") * base + F.least(F.col("c.segno"), rem)
    pos = si + F.col("c.d") + 1  # 1-based
    b = (
        names.select(
            "brand",
            F.col("L").alias("lb"),
            F.col("name").alias("name_b"),
            F.explode(combos).alias("c"),
        )
        .withColumn("la", F.col("lb") + F.col("c.dl"))
        .withColumn("pos", pos)
        .withColumn("li", li)
        .filter(
            (F.col("la") >= _NSEG)
            & (F.col("li") >= 1)
            & (F.col("pos") >= 1)
            & (F.col("pos") + F.col("li") - 1 <= F.col("lb"))
        )
        .select(
            "brand",
            "la",
            "name_b",
            F.col("c.segno").alias("segno"),
            F.col("name_b").substr(F.col("pos"), F.col("li")).alias("seg"),
        )
    )

    # Candidate join: BROADCAST the probe side (r11 perf re-tune,
    # VERDICT r10 item 1).  The probe leg is exactly _NSEG rows per
    # DISTINCT name — the dictionary-encoded design bounds it by
    # vocabulary, not corpus, so it stays broadcastable at 100× data
    # (distinct names grow sublinearly).  Broadcasting removes BOTH
    # the join's two shuffle legs, and with it the need for the index
    # side's pre-join dropDuplicates — duplicate (segno, seg) keys
    # (shifted substrings that coincide) only duplicate CANDIDATES,
    # which the name-level dropDuplicates below already collapses;
    # measured value-identical and ~2× faster at sf0.1.  The hint is
    # GATED on a measured size estimate (ADVICE r11): one cheap agg
    # over the distinct-name relation sizes the probe leg against
    # spark.sql.autoBroadcastJoinThreshold, so an oversized name
    # dictionary degrades to the shuffle join instead of OOMing the
    # driver — no human in the loop.
    probe = a
    if stats_key is not None and stats_key in _NAME_STATS:
        n_names, alen = _NAME_STATS[stats_key]
    else:
        est = names.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.length("name")).alias("alen"),
        ).first()
        n_names, alen = int(est["n"] or 0), float(est["alen"] or 0)
        if stats_key is not None:
            _NAME_STATS[stats_key] = (n_names, alen)
    # per probe row: seg (≤ name len) + name_a (len) + brand + la +
    # segno + struct/row overhead ≈ 2·len + 64 bytes, × _NSEG rows
    est_bytes = int(n_names * _NSEG * (2 * alen + 64))
    if est_bytes <= _broadcast_threshold_bytes(names.sparkSession):
        probe = F.broadcast(a)
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        probe.join(b, ["brand", "la", "segno", "seg"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("brand", "name_a", "name_b")
        .dropDuplicates(["brand", "name_a", "name_b"])
        .filter(dist <= MAX_DIST)
        .withColumn("dist", dist.cast("bigint"))
    )


def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs within a brand (levenshtein <= 2),
    each unordered key pair once — dictionary-encoded PassJoin pipeline,
    value-equal to the brute-force blocked join (the oracle)."""
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
    )
    # the broadcast gate's size estimate is MEMOIZED per input path
    # (the rank-corr scratch-memo precedent): the two statistics are
    # deterministic for an immutable dataset, so only the FIRST call
    # pays the extra distinct scan — repeated invocations keep r11's
    # single-DAG plan where AQE's ReusedExchange computes the
    # distinct once for both PassJoin legs (a session-lifetime
    # .persist() pin was the r12a attempt; the memo holds two scalars
    # instead of a cached relation)
    names = p.select("brand", "name").distinct().withColumn(
        "L", F.length("name")
    )
    np_ = _name_pairs(names, stats_key=_stats_key(sf_dir))

    # distance-0 pairs: same (brand, name), different keys
    a, b = p.alias("a"), p.alias("b")
    same = (
        a.join(
            b,
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.name") == F.col("b.name"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(
            F.col("a.brand").alias("p_brand"),
            F.col("a.pk").alias("key_a"),
            F.col("b.pk").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.lit(0).cast("bigint").alias("dist"),
        )
    )

    # cross-name matches: expand each name pair to its key groups
    ga = p.select(
        F.col("brand"), F.col("name").alias("name_a"), F.col("pk").alias("pk1")
    )
    gb = p.select(
        F.col("brand"), F.col("name").alias("name_b"), F.col("pk").alias("pk2")
    )
    cross = (
        F.broadcast(np_)
        .join(ga, ["brand", "name_a"])
        .join(gb, ["brand", "name_b"])
        .select(
            F.col("brand").alias("p_brand"),
            F.least("pk1", "pk2").alias("key_a"),
            F.greatest("pk1", "pk2").alias("key_b"),
            # names follow the key order the oracle emits
            F.when(F.col("pk1") < F.col("pk2"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("name_a"),
            F.when(F.col("pk1") < F.col("pk2"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("name_b"),
            F.col("dist"),
        )
    )
    return same.unionByName(cross)


# Oracle = the obviously-correct brute-force spec; the gate proves the
# dictionary-encoded PassJoin path equals it.
O_FUZZY_PART_PAIRS = f"""
SELECT a.p_brand,
       a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {MAX_DIST}
"""


QUERIES = {"fuzzy_part_pairs": q_fuzzy_part_pairs}
ORACLES = {"fuzzy_part_pairs": O_FUZZY_PART_PAIRS}
