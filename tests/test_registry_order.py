"""Driver-window ordering invariants.

The driver's correctness gate checks the first 50 entries of queries():
every slot must carry an oracle, and every oracled query outside the
window must be covered by the x_signatures bundle so no SURVEY §2
operator is invisible to the hard signal.
"""

from openseizuredatabase_spark.plans import registry
from openseizuredatabase_spark.plans.registry import QUERIES


def test_window_is_50_and_fully_oracled():
    names = list(QUERIES)
    assert len(names) >= 50
    window = names[:50]
    assert window == registry._DRIVER_WINDOW
    for n in window:
        assert QUERIES[n].oracle is not None, f"{n} in window without oracle"


def test_rows_only_queries_sit_past_window():
    names = list(QUERIES)
    rows_only = [n for n in names if QUERIES[n].oracle is None]
    assert rows_only, "expected some rows-only queries"
    for n in rows_only:
        assert names.index(n) >= 50, f"rows-only {n} burns a window slot"


def test_signature_bundle_covers_every_past_window_oracled_query():
    names = list(QUERIES)
    past = {n for n in names[50:] if QUERIES[n].oracle is not None}
    members = {m for m, _, _ in registry._sig_members()}
    assert members == past, (
        f"uncovered: {sorted(past - members)}; stale: {sorted(members - past)}"
    )


def test_signature_exprs_are_integer_only():
    # the portability guarantee: no float-valued function may reach k/v
    # un-quantized — every round( must be wrapped in a CAST ... AS BIGINT
    # (via _sig_q6) and no bare division appears.
    for m, k, v in registry._sig_members():
        for expr in (k, v):
            assert "/" not in expr, (m, expr)
            assert expr.count("round(") == expr.count("CAST(round("), (m, expr)


def test_bundle_oracle_mentions_every_member():
    sql = QUERIES["x_signatures"].oracle
    for m, _, _ in registry._sig_members():
        assert f"'{m}'" in sql
