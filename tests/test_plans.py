"""Physical-plan regression tests: the scale-critical plan properties
claimed in SCALING.md must actually hold in the executed plan."""

from __future__ import annotations

from clickhouse_vs_dbt_spark.operators.curation import (
    q_decontaminate_ngram,
    q_export_shards,
    q_mixture_weighted_sample,
    q_sequence_pack,
)
from clickhouse_vs_dbt_spark.operators.timeseries import q_events_argmax_state


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mixture_sample_has_no_keyed_shuffle(spark, sf_dir):
    """The sample is a scan-side predicate + projection; the only
    exchange allowed is the final presentation sort's range partition."""
    plan = _plan(q_mixture_weighted_sample(spark, sf_dir))
    assert "hashpartitioning" not in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    plan = _plan(q_decontaminate_ngram(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_windows_are_keyed_not_global(spark, sf_dir):
    """sequence_pack and export_shards use partitioned windows — a
    SinglePartition window would serialize the corpus through one task."""
    for q in (q_sequence_pack, q_export_shards):
        plan = _plan(q(spark, sf_dir))
        assert "Window" in plan
        # the window's exchange must be hash-partitioned by its key
        assert "hashpartitioning" in plan


def test_argmax_state_avoids_window_sort(spark, sf_dir):
    """The aggregate form must plan as hash aggregate with partial
    max_by — no Window operator, no per-partition sort of all events."""
    plan = _plan(q_events_argmax_state(spark, sf_dir))
    assert "Window" not in plan
    assert "max_by" in plan


def test_unigram_quality_broadcasts_vocab(spark, sf_dir):
    """The Zipf vocab must ship to the token relation as a broadcast —
    a shuffled vocab join would re-exchange the fact side."""
    from clickhouse_vs_dbt_spark.operators.corpus import q_unigram_freq_quality

    plan = _plan(q_unigram_freq_quality(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_gap_interpolate_has_no_unbounded_following_frame(spark, sf_dir):
    """Forward scan must be the descending running frame (O(1)/row) —
    an unbounded-following frame re-scans the partition tail per row."""
    from clickhouse_vs_dbt_spark.operators.timeseries import (
        q_events_gap_interpolate,
    )

    plan = _plan(q_events_gap_interpolate(spark, sf_dir))
    assert "unboundedfollowing" not in plan.lower()


def test_ivf_exact_probes_broadcast(spark, sf_dir):
    """Probe set (|queries| x NPROBE rows) must broadcast onto the
    assigned corpus — the corpus never re-shuffles for a probe."""
    from clickhouse_vs_dbt_spark.operators.similarity import (
        q_ann_topk_ivf_exact,
    )

    plan = _plan(q_ann_topk_ivf_exact(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
