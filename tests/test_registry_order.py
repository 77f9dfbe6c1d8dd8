"""Driver-window ordering invariants.

The driver's correctness gate checks the first 50 entries of queries():
every slot must carry an oracle, and every oracled query outside the
window must be covered by exactly one x_sig_* signature shard so no
SURVEY §2 operator is invisible to the hard signal — and so one broken
member reddens only its table-family shard, not the whole population.
"""

from openseizuredatabase_spark.plans import registry
from openseizuredatabase_spark.plans.registry import QUERIES

SHARDS = tuple(registry._SIG_SHARD_FAMILIES)


def test_window_is_50_and_fully_oracled():
    names = list(QUERIES)
    assert len(names) >= 50
    window = names[:50]
    assert window == registry._DRIVER_WINDOW
    for n in window:
        assert QUERIES[n].oracle is not None, f"{n} in window without oracle"


def test_all_four_shards_hold_window_slots():
    window = list(QUERIES)[:50]
    for shard in SHARDS:
        assert shard in window, f"{shard} missing from the driver window"


def test_rows_only_queries_sit_past_window():
    """Round 7 reached 0 rows-only entries (w5_epoch_features retired in
    favour of the fully-oracled w5_epoch_oracled); any future rows-only
    entry must still sit past the 50-slot window."""
    names = list(QUERIES)
    rows_only = [n for n in names if QUERIES[n].oracle is None]
    for n in rows_only:
        assert names.index(n) >= 50, f"rows-only {n} burns a window slot"


def test_shards_partition_every_past_window_oracled_query():
    """Union of the shard member sets == the past-window oracled set,
    and the shards are pairwise disjoint (each member is owned by
    exactly one shard, so a break has exactly one place to show up)."""
    names = list(QUERIES)
    past = {
        n
        for n in names[50:]
        if QUERIES[n].oracle is not None and n not in SHARDS
    }
    members = {m for m, _, _ in registry._sig_members()}
    assert members == past, (
        f"uncovered: {sorted(past - members)}; stale: {sorted(members - past)}"
    )
    seen: dict[str, str] = {}
    for shard in SHARDS:
        for m, _, _ in registry._sig_members_for(shard):
            assert m not in seen, f"{m} in both {seen[m]} and {shard}"
            seen[m] = shard
    assert set(seen) == members


def test_every_member_maps_to_a_registered_shard():
    for m, _, _ in registry._sig_members():
        shard = registry._sig_shard_of(m)
        assert shard in QUERIES


def test_signature_exprs_are_integer_only():
    # the portability guarantee: no float-valued function may reach k/v
    # un-quantized — every round( must be wrapped in a CAST ... AS BIGINT
    # (via _sig_q6) and no bare division appears.
    for m, k, v in registry._sig_members():
        for expr in (k, v):
            assert "/" not in expr, (m, expr)
            assert expr.count("round(") == expr.count("CAST(round("), (m, expr)


def test_shard_oracles_mention_exactly_their_members():
    for shard in SHARDS:
        sql = QUERIES[shard].oracle
        mine = {m for m, _, _ in registry._sig_members_for(shard)}
        for m in mine:
            assert f"'{m}'" in sql
        for m, _, _ in registry._sig_members():
            if m not in mine:
                assert f"'{m}'" not in sql, f"{m} leaked into {shard}"
