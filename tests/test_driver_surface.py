"""Driver-surface wiring (plans/fold_queries.py, VERDICT r5 item 1): the
correctness gate records the first 50 sorted names of
``__spark_entry__.queries()``, so the surface must stay <= 50 while every
granular capability keeps a value-exact driver row via its fold."""

from __future__ import annotations

from collections import Counter

from s3_access_logs_spark.plans.catalog import driver_surface, load_all


def test_surface_fits_correctness_window():
    assert len(driver_surface()) <= 50


def test_every_entry_in_surface_or_exactly_one_fold():
    all_q = load_all()
    surface = driver_surface()
    member_counts = Counter(
        m for q in all_q.values() for m in q.members
    )
    dupes = {m: c for m, c in member_counts.items() if c > 1}
    assert not dupes, f"entries folded more than once: {dupes}"
    unknown = set(member_counts) - set(all_q)
    assert not unknown, f"folds reference unknown entries: {unknown}"
    for name in all_q:
        in_surface = name in surface
        in_fold = name in member_counts
        assert in_surface != in_fold, (
            f"{name}: must be driver-visible directly XOR via a fold "
            f"(surface={in_surface}, folded={in_fold})"
        )


def test_folds_stay_value_checked():
    all_q = load_all()
    for q in all_q.values():
        if not q.members:
            continue
        assert q.oracle is not None, f"{q.name}: fold lost its oracle"
        assert not q.bench, (
            f"{q.name}: folds must not double-count in the bench set"
        )
        for m in q.members:
            assert all_q[m].oracle is not None, (
                f"{q.name}: member {m} is rows-only — folding it would "
                f"silently weaken the whole fold to rows-only"
            )
            assert not _oracle_mentions_tag_col(all_q[m]), (
                f"{q.name}: member {m}'s oracle aliases or selects a "
                f"column named 'entry' — collides with the fold tag "
                f"(the Spark side is guarded at fold build time in "
                f"fold_queries._fold.builder)"
            )


def _oracle_mentions_tag_col(q) -> bool:
    # cheap, case-insensitive guard: a member whose oracle aliases a
    # column as the fold tag would collide with the tag the fold prepends
    # (DuckDB UNION ALL BY NAME would silently merge them). The bare
    # `entry` select / source-column case is caught by the Spark-side
    # build-time columns check, which the driver's side-by-side run
    # exercises for every fold.
    import re

    return bool(re.search(r"(?i)\bAS\s+entry\b", q.oracle or ""))
