"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"ssb_q1_1": sec, ...}, "sf": 0.1}

Each query is forced with a ``noop``-format write — full computation on
the executors, nothing materialized on the driver — so timings reflect
scan + shuffle + compute, the same thing that matters on a real cluster.
A warmup action runs first so JVM/codegen startup is not billed to the
first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    # reference surface: SSB flight over the star join (SURVEY.md §2.1)
    "ssb_q1_1",
    "ssb_q1_2",
    "ssb_q1_3",
    "ssb_q2_brand_revenue",
    "ssb_q2_2",
    "ssb_q2_3",
    "ssb_q3_nation_revenue",
    "ssb_q3_2",
    "ssb_q3_3",
    "ssb_q3_4",
    "ssb_q4_profit",
    "ssb_q4_2",
    "ssb_q4_3",
    "star_build",
    # extended relational
    "tpch_q1_pricing_summary",
    "top_customers",
    "window_rank_parts",
    # adapted TPC-H flight (normalized-schema join shapes)
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    # training-data pipeline extensions (SURVEY.md §2.3)
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality",
    "text_chunks",
    "stratified_sample",
    "sequence_pack",
    "export_shards",
    "text_pii_scrub",
    "dq_checks",
    "events_tumbling_window",
    "events_gap_fill",
    "events_rollup_hierarchy",
    # ClickHouse analytics-function parity (operators/chfuncs.py)
    "events_funnel_window",
    "events_retention_matrix",
    "events_group_array",
    # window breadth + lateral (operators/windowfns.py)
    "window_trailing_30d",
    "lateral_top_orders",
    # span-level dedup (operators/boilerplate.py)
    "dedup_boilerplate",
    # statistics / sketches (operators/stats.py, operators/hll.py)
    "stats_moments",
    "weighted_median",
    "hll_distinct_users",
    # map vocabulary + fuzzy matching + geo/ip families
    "map_functions_suite",
    "fuzzy_part_pairs",
    "geo_distance",
    "ipv4_functions_suite",
    # co-located bucketed join (plans/bucketing.py)
    "bucketed_join_revenue",
    # round-2 additions: scalar breadth, join breadth, pipeline depth,
    # iterative graph, incremental-MV maintenance
    "string_search_suite",
    "datetime_trunc_suite",
    "full_outer_nation_balance",
    "dedup_incremental",
    "unigram_freq_quality",
    "pagerank_trade_graph",
    "incremental_agg_mv",
    # round-2 late additions: dialect layer, codecs, interpolation,
    # HOF arrays, Arrow-UDF path, statistical tests, ratio-to-report
    "clickhouse_dialect_rollup",
    "codec_suite",
    "events_gap_interpolate",
    "array_hof_suite",
    "text_char_diversity",
    "linreg_price_on_qty",
    "welch_ttest_events",
    "cramers_v_segment_status",
    "events_topk_sketch",
    "ratio_to_total",
    "bloom_semi_join",
    "variant_json_suite",
    "limit_by_analog",
    "ml_inference_sql",
    "events_max_intersections",
    # round-3 additions: aggregate analogs pt 2, serving-path IVF,
    # value-checked multimodal decode, training-order shuffle, z-order
    "events_sum_map",
    "events_interval_length_sum",
    "events_rank_corr",
    "events_delta_sum",
    "ann_topk_ivf_pruned",
    "multimodal_decode_features",
    "corpus_shuffle",
    "zorder_key_orders",
    "corpus_pair_counts",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "events_sequence_next_node",
    # round-4 additions: full MergeTree engine family (sorted reads
    # dropped — gate hash is order-insensitive)
    "mergetree_replacing_final",
    "mergetree_collapsing",
    "mergetree_summing",
    "mergetree_versioned_collapsing",
    "mergetree_aggregating",
    "mergetree_ttl_rollup",
    # round 4: dialect front-end + ClickHouse join/sample semantics
    "dialect_combinators",
    "dialect_array_hof",
    "dialect_with_totals",
    "dialect_array_join_clause",
    "any_left_join",
    "clickhouse_sample_clause",
    "incremental_insert_overwrite",
    "incremental_time_travel",
    "mutation_delete_update",
    "maintenance_compaction",
    "dialect_strings",
    "events_lttb_downsample",
    # round-5 additions: structural dialect rewrites (LIMIT BY, ASOF
    # union-window, WITH FILL spine, exact topK, 1-based subscripts)
    # and the MATERIALIZED VIEW DDL front door
    "dialect_limit_by",
    "dialect_asof_join",
    "dialect_with_fill",
    "dialect_topk",
    "dialect_subscript",
    "ddl_mv_roundtrip",
    # round-5 analytics-aggregate transpiles + ANY-join collapse
    "dialect_window_funnel",
    "dialect_retention",
    "dialect_sequence_match",
    "dialect_any_join",
    "dialect_with_fill_date",
    "ddl_final_read",
    "dialect_combinators2",
    "dialect_with_fill_interp",
    "ddl_final_versioned",
    "dialect_array_join_zip",
    "dbt_star_verbatim",
    "dialect_numbers",
    "dialect_file_read",
    "ch_script_lifecycle",
    "ddl_final_summing",
    "dialect_scalar_extras",
    "dialect_json_url",
    "multimodal_png_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_gif_roundtrip",
    # round-6 additions: ON-form joins, DESC/multi-key fills,
    # Collapsing FINAL, exact weighted topK, sequenceCount, and the
    # value-checked IVF / portable-sketch conversions
    "dialect_asof_on",
    "dialect_any_join_on",
    "dialect_with_fill_desc",
    "dialect_with_fill_multikey",
    "ddl_final_collapsing",
    "dialect_topk_weighted",
    "dialect_sequence_count",
    "ann_topk_ivf",
    "approx_distinct_quantiles",
    "dialect_distinct_on",
    "dialect_modern_sql",
    "ch_script_schema_evolution",
    # round-7 additions
    "dialect_star_modifiers",
    "dialect_sample_clause",
    "dialect_state_merge",
    "dialect_with_fill_expr",
    "dialect_columns_select",
    "mixture_token_budget",
    "dialect_dictionary",
    "dialect_state_merge2",
    # round-8 additions: portable uniq/quantile states, sequence
    # guards, funnel modes, runtime-fraction SAMPLE n, the r8 scalar
    # probe batch, and the EXCHANGE TABLES blue/green script
    "dialect_state_merge3",
    "dialect_sequence_guard",
    "dialect_sample_rows",
    "dialect_probe8",
    "dialect_funnel_dedup",
    "ch_script_blue_green",
    "ch_script_retention",
    # round-8 statistical-test family + scalar batch 2
    "dialect_ttest",
    "stats_mann_whitney",
    "stats_ks_test",
    "stats_categorical_assoc",
    "dialect_probe9",
    "dialect_sequence_guard2",
    "dialect_vector_math",
    "dialect_meanz",
    "dialect_probe10",
    "dialect_normalize",
    "ddl_mv_avg",
    "ddl_mv_uniq",
    "ddl_mv_quantile",
    "ch_script_detach",
    "ch_script_partition_ops",
    "dialect_probe11",
    "dialect_window_derivative",
    "dialect_argmax_combinators",
    "dialect_exp_decay",
    "dialect_probe13",
    # round-9 additions: Kafka queue+MV runbook, argMax states,
    # PASTE JOIN, deterministic group-array tiers, punycode/IDNA
    "ddl_kafka_stream",
    "dialect_state_merge4",
    "ddl_mv_argmax",
    "dialect_paste_join",
    "dialect_group_array_tiers",
    "dialect_idn_family",
    "dialect_json_merge",
    "dialect_probe14",
    "dialect_interval_sweeps",
    "dialect_probe15",
    "dialect_probe16",
    "dialect_probe17",
    "dialect_probe18",
    # round-10 additions: fuzzy metrics, JSON path walk, overflow sums,
    # id generators
    "dialect_fuzzy_family",
    "dialect_json_paths",
    "dialect_sum_overflow",
    "dialect_uuid_generators",
    # round-11 additions: -Resample buckets, reinterpret/tuple/group
    # matrices, Hilbert indexing
    "dialect_resample",
    "dialect_reinterpret_tuples",
    "dialect_hilbert",
    "dialect_weighted_quantiles",
    "dialect_tumble",
    "dialect_probe19",
    # round-13 additions: the WGS-84 geoDistance flip, the
    # join-owned bounded groupConcat, the full-definition
    # ATTACH restore script, and the no-equality ANY JOIN
    # running-min form
    "dialect_geo_distance",
    "dialect_group_concat_join",
    "ch_script_attach_full",
    "dialect_probe22",
    "dialect_any_join_noeq",
    "dialect_probe23",
    "dialect_probe24",
    # r14 additions
    "dialect_wkt_geometry",
    "dialect_series_tukey",
    "dialect_probe25",
    "dialect_probe26",
    # r15 additions
    "dialect_probe27",
    "dialect_series_fft",
    "dialect_qw_expr",
    "dialect_probe28",
    "dialect_probe29",
    "dialect_probe30",
    "dialect_statement_forms",
    # r16 (mid-build audit batch 33) additions
    "dialect_probe31",
    "dialect_probe32",
    "dialect_window_heads",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as e
    from clickhouse_vs_dbt_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()

    # Warmup: touch every fixture table once (file listing, footer reads,
    # codegen warm) so per-query numbers measure the query, not startup.
    from clickhouse_vs_dbt_spark.catalog import FIXTURE_TABLES, load_table

    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    # Machine-speed calibration: a fixed, data-independent JVM workload
    # (range → mix-hash → sum, all codegen'd, zero I/O).  Round-over-
    # round environments differ (different VM instances / hosts): in
    # round 4 byte-identical queries ran a uniform ~1.3× slower than
    # round 3's artifact.  calib_sec moves with the machine, so
    # query_sec / calib_sec is the cross-round-comparable quantity.
    # Median of 5 recorded runs (VERDICT r9 item 2): min-of-3 let one
    # fast outlier set the round's denominator — r8's 0.484 (vs the
    # 0.39-0.41 band every other round) manufactured both r8's apparent
    # 20% win and r9's apparent 25% regression.  The median is robust
    # to a single anomalous run in either direction, and calib_runs in
    # the archive lets any round's denominator be audited after the
    # fact.
    def _calib_kernel() -> None:
        spark.range(0, 2_000_000_000, 1, 32).selectExpr(
            # (id % 2^20) bounds the product below 2^52: ANSI-safe
            "sum((id % 1048576) * 2654435761 % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()

    # r14 (VERDICT r13 item 5): the r13 same-code byte-identical
    # bench pair measured THIS kernel drifting −22% while real
    # queries moved the other way — the single warmup left JIT/
    # thermal transients in the sample.  Now: TWO discarded warmups
    # (C2 compilation of the hash loop finishes in the second run),
    # median of SEVEN, and the relative spread recorded as
    # calib_spread so every archive documents its own denominator
    # stability.  A second, independent kernel (string hash — a
    # different JIT/memory profile) is recorded as calib2_sec for
    # cross-checking a suspect axis; the NORMS stay on kernel 1,
    # which every archived round used.
    _calib_kernel()  # untimed: JIT-cold (~1.8× slow)
    _calib_kernel()  # untimed: C2 recompile can land mid-second-run
    calib_runs: list[float] = []
    for _ in range(7):
        t0 = time.perf_counter()
        _calib_kernel()
        calib_runs.append(round(time.perf_counter() - t0, 3))
    calib = round(sorted(calib_runs)[len(calib_runs) // 2], 3)
    calib_spread = round(
        (max(calib_runs) - min(calib_runs)) / calib, 3
    ) if calib else None

    def _calib_kernel2() -> None:
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            # % bounds the sum below 2^63 (ANSI-safe)
            "sum(xxhash64(CAST(id AS STRING)) % 1000003) AS s"
        ).write.format("noop").mode("overwrite").save()

    # same two-warmup discipline as kernel 1 — a single warmup is
    # exactly the C2-transient hole this change closes
    # (code-review r14a)
    _calib_kernel2()
    _calib_kernel2()
    calib2_runs: list[float] = []
    for _ in range(7):
        t0 = time.perf_counter()
        _calib_kernel2()
        calib2_runs.append(round(time.perf_counter() - t0, 3))
    calib2 = round(sorted(calib2_runs)[len(calib2_runs) // 2], 3)
    calib2_spread = round(
        (max(calib2_runs) - min(calib2_runs)) / calib2, 3
    ) if calib2 else None

    # Best-of-2 per query: the second run has Catalyst planning + codegen
    # JIT warm, i.e. steady-state throughput — the quantity that scales to
    # a long-lived cluster (per-query compile time is fixed, not per-TB).
    # Queries in REPEATS get more runs: their round-over-round history
    # showed >±15% swings with no code change (bench variance on a ~1 s
    # query), so a deeper best-of pins the steady-state number.
    REPEATS = {
        "bloom_semi_join": 4,
        # >±50% round-over-round swings with untouched code (r6-r8):
        # deeper best-of pins the steady state
        "fuzzy_part_pairs": 4,
        "maintenance_compaction": 4,
    }
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            print(f"bench: missing query {name!r}", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(REPEATS.get(name, 2)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # In-round perf tripwire (VERDICT r10 item 7): diff per-query
    # calibration-normalized time against the newest archived
    # BENCH_full and surface every >1.5× mover — fuzzy_part_pairs
    # regressed 2.09× silently in r10 because only totals were
    # reported.  A small absolute floor (norm ≥ 0.5, i.e. half the
    # calibration kernel) keeps sub-100 ms micro-queries from
    # tripping on scheduler noise.
    # Confirm-rerun (VERDICT r12 item 1): r12 flagged two
    # unchanged-code queries (ssb_q3_nation_revenue 1.64×,
    # geo_distance 1.51×) that sat inside their historical bands —
    # one fresh best-of-2 separates a real regression from a noisy
    # first measurement.  Both numbers are archived; the query's
    # recorded timing takes the min (the same best-of semantics as
    # the primary loop), and an entry survives in `regressions` only
    # when the RERUN still exceeds 1.5× — noise-band trips are
    # demoted to `regression_noise`.
    regressions: dict[str, dict[str, float]] = {}
    regression_noise: dict[str, dict[str, float]] = {}
    try:
        import glob as _glob

        here0 = os.path.dirname(os.path.abspath(__file__))
        # numeric round sort (ADVICE r11): lexicographic order only
        # worked while round numbers shared a width — r100 (or an
        # unpadded archive) would silently pick a stale baseline
        fulls = sorted(
            (
                p
                for p in _glob.glob(
                    os.path.join(here0, "BENCH_full_r*.json")
                )
                if re.search(r"BENCH_full_r(\d+)\.json$", p)
            ),
            key=lambda p: int(
                re.search(r"BENCH_full_r(\d+)\.json$", p).group(1)
            ),
        )
        if fulls and calib:
            prev = json.load(open(fulls[-1]))
            prev_norm = prev.get("queries_norm") or {}
            prev_secs = prev.get("queries") or {}
            for q, sec in sorted(timings.items()):
                nn = sec / calib
                pn = prev_norm.get(q)
                if not (
                    pn and pn > 0 and nn >= 0.5 and nn / pn > 1.5
                ):
                    continue
                # Raw-seconds cross-check (r17 measurement-bug fix):
                # when the previous archive's CALIBRATION median sat
                # far from this run's, every query's norm ratio moves
                # together and the tripwire floods — this round's
                # baseline archive (calib 0.816 vs 0.454 here)
                # "confirmed" ~150 regressions whose raw seconds were
                # flat, doubling bench wall time with pointless
                # reruns.  A real plan regression moves raw seconds
                # too, so require BOTH axes to trip before spending a
                # rerun.
                psec = prev_secs.get(q)
                if psec and psec > 0 and sec / psec <= 1.5:
                    continue
                fn = qs.get(q)
                best2 = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best2 = min(best2, time.perf_counter() - t0)
                best2 = round(best2, 3)
                nn2 = best2 / calib
                # raw seconds ride along so a CALIBRATION-median
                # shift is visible at a glance: same-code r13 pair
                # measured raw totals −10% while the calib kernel
                # moved −22%, inflating every norm +17% — a flagged
                # query whose raw seconds are flat is a denominator
                # artifact, not a plan change
                prev_q = psec
                entry = {
                    "prev_norm": round(pn, 2),
                    "norm": round(nn, 2),
                    "ratio": round(nn / pn, 2),
                    "rerun_norm": round(nn2, 2),
                    "rerun_ratio": round(nn2 / pn, 2),
                    "prev_sec": prev_q,
                    "sec": sec,
                    "rerun_sec": best2,
                }
                timings[q] = min(timings[q], best2)
                if nn2 / pn > 1.5 and (
                    not psec or psec <= 0 or best2 / psec > 1.5
                ):
                    regressions[q] = entry
                    print(
                        f"bench: REGRESSION (confirmed) {q}: norm "
                        f"{entry['prev_norm']} -> {entry['norm']}, "
                        f"rerun {entry['rerun_norm']} "
                        f"({entry['rerun_ratio']}x vs {fulls[-1]})",
                        file=sys.stderr,
                    )
                else:
                    regression_noise[q] = entry
                    print(
                        f"bench: regression NOT confirmed {q}: first "
                        f"{entry['norm']}, rerun {entry['rerun_norm']} "
                        f"(prev {entry['prev_norm']}) — noise band",
                        file=sys.stderr,
                    )
    except (OSError, ValueError, KeyError) as exc:
        print(f"bench: regression diff failed: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Round-over-round comparability: the headline set grows every
    # round, so also report the total over round 1's 27-query subset —
    # that is the like-for-like number against BENCH_r01.json.
    r01_subset = [
        "ssb_q1_1", "ssb_q1_2", "ssb_q1_3", "ssb_q2_brand_revenue",
        "ssb_q2_2", "ssb_q2_3", "ssb_q3_nation_revenue", "ssb_q3_2",
        "ssb_q3_3", "ssb_q3_4", "ssb_q4_profit", "ssb_q4_2", "ssb_q4_3",
        "star_build", "tpch_q1_pricing_summary", "top_customers",
        "window_rank_parts", "dedup_exact", "dedup_minhash_lsh",
        "ann_topk_bruteforce", "text_quality", "text_chunks",
        "stratified_sample", "dq_checks", "events_tumbling_window",
        "events_gap_fill", "events_rollup_hierarchy",
    ]
    r01_total = round(sum(timings.get(q, 0.0) for q in r01_subset), 3)

    payload = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "r01_subset_total": r01_total,
        "calib_sec": calib,
        "calib_runs": calib_runs,
        # (max-min)/median over the 7 recorded runs — the
        # denominator's own stability; read norms with a band this
        # wide at minimum (r14, VERDICT r13 item 5)
        "calib_spread": calib_spread,
        # independent second kernel (string-hash profile): when the
        # two kernels disagree on direction vs last round, the axis
        # moved, not the code
        "calib2_sec": calib2,
        "calib2_runs": calib2_runs,
        "calib2_spread": calib2_spread,
        # self-calibrating pick (r15, VERDICT r14 item 5): which
        # kernel's norms to TRUST this round — the one with the
        # lower measured spread.  Read rule (SCALING.md): compare
        # rounds on headline_norm when calib_pick == "calib", on
        # headline_norm2 when "calib2"; cross-kernel comparisons
        # are meaningless (different workloads, different scales)
        "calib_pick": (
            "calib2"
            if (
                calib_spread is not None
                and calib2_spread is not None
                and calib2_spread < calib_spread
            )
            else "calib"
        ),
        # calibration-normalized figures: seconds ÷ calib_sec — the
        # cross-round-comparable axis (SCALING.md "environment drift").
        # Units: multiples of the fixed 2B-row codegen workload.
        "headline_norm": round(total / calib, 2) if calib else None,
        "r01_subset_norm": round(r01_total / calib, 2) if calib else None,
        "queries_norm": {
            k: round(v / calib, 2) for k, v in timings.items()
        } if calib else None,
        # the same figures on the SECOND kernel's axis (r15,
        # VERDICT r14 item 5): archived every round so whichever
        # kernel is steadier (calib_pick) has a full norm history
        # to read against
        "headline_norm2": round(total / calib2, 2) if calib2 else None,
        "r01_subset_norm2": (
            round(r01_total / calib2, 2) if calib2 else None
        ),
        "queries_norm2": {
            k: round(v / calib2, 2) for k, v in timings.items()
        } if calib2 else None,
        # >1.5× normalized movers vs the previous archived BENCH_full
        # whose confirm-rerun ALSO exceeded 1.5× (empty = no
        # confirmed regression; the in-round tripwire, r11 + r13)
        "regressions": regressions,
        # movers whose rerun fell back inside 1.5× — measurement
        # noise, recorded for the audit trail (r13)
        "regression_noise": regression_noise,
    }
    # The driver's BENCH_r{N}.json stores only the TAIL of stdout: round
    # 15's contract line grew past the capture window (per-query map +
    # two per-query norm maps + rerun blocks) and parsed as null, which
    # blanked the whole round-over-round table in PERF_r16 (VERDICT r16
    # item 2).  Print a line with BOUNDED per-key size: every driver
    # contract key (metric/value/unit/queries/sf) plus scalar
    # calibration figures; the per-query NORM maps, calib run lists and
    # rerun detail live only in the BENCH_full artifact, pointed to by
    # "full_artifact".
    line_keys = (
        "metric", "value", "unit", "queries", "sf", "n_queries",
        "r01_subset_total", "calib_sec", "calib_spread", "calib2_sec",
        "calib2_spread", "calib_pick", "headline_norm",
        "r01_subset_norm", "headline_norm2", "r01_subset_norm2",
    )
    line = {k: payload[k] for k in line_keys}
    # confirmed-regression NAMES stay on the line (the full entries are
    # in the artifact); noise-demoted names ride along for the audit
    line["regressions"] = sorted(regressions)
    line["regression_noise"] = sorted(regression_noise)
    # Self-archive the COMPLETE payload next to the driver artifacts
    # (next round index = one past the newest existing BENCH_r*.json).
    try:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n = (max(rounds) + 1) if rounds else 1
        full_name = f"BENCH_full_r{n:02d}.json"
        with open(os.path.join(here, full_name), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        line["full_artifact"] = full_name
    except OSError as exc:  # self-archive is best-effort
        print(f"bench: full-artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
