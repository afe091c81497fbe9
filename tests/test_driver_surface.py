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
            assert "entry" not in _oracle_first_select_cols(all_q[m]), (
                f"{q.name}: member {m} uses the fold tag column name"
            )


def _oracle_first_select_cols(q) -> set[str]:
    # cheap guard: a member whose oracle aliases a column as the fold tag
    # would collide with the tag the fold prepends
    import re

    return set(re.findall(r"AS\s+(entry)\b", q.oracle or ""))
