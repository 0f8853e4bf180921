"""Registry: engine-facade routes as oracle-gated rows (VERDICT r4 #7).

``MarketplaceEngine`` (engine.py) is the route-level surface a user of the
reference calls after switching — each method reproduces one HTTP handler
(reference src/routes/*.ts). The operator library under it is gate-covered,
but until round 5 only ``ads_search`` flowed through a driver-checked key.
These rows exercise the FACADE itself: each builder calls the engine method,
not the operators directly, so the route-composition layer (param plumbing,
column drops, envelope shape) is value-checked against DuckDB too.
"""

from __future__ import annotations

from ..engine import MarketplaceEngine
from . import register


@register(
    "facade_get_ad",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
           o.o_orderdate, o.o_orderpriority, c.c_name, c.c_mktsegment,
           coalesce(n.n_items, 0) AS n_items
    FROM orders o
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN (SELECT l_orderkey, count(*) AS n_items
               FROM lineitem GROUP BY l_orderkey) n
      ON n.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey = 7777
    """,
)
def q_facade_get_ad(spark, sf_dir):
    """GET /api/ads/:id through the facade (reference src/routes/ads.ts:
    178-195): point lookup + owner n:1 join + favorites relation count,
    exactly as ``MarketplaceEngine.get_ad`` composes them."""
    return MarketplaceEngine(spark, sf_dir).get_ad(7777)


@register(
    "facade_my_ads",
    oracle="SELECT * FROM orders WHERE o_custkey = 42 AND o_orderstatus <> 'F'",
)
def q_facade_my_ads(spark, sf_dir):
    """GET /api/ads/user/me through the facade (reference src/routes/ads.ts:
    213-231): owner's non-deleted rows, newest first (row order is
    engine-side; the gate compares order-insensitively)."""
    return MarketplaceEngine(spark, sf_dir).my_ads(42)


@register(
    "facade_conversations",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT events.*,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id = 42
    ) WHERE rn = 1
    """,
)
def q_facade_conversations(spark, sf_dir):
    """GET /api/chat/conversations through the facade (reference
    src/routes/chat.ts:83-124): the caller's threads with the latest
    message each, newest activity first."""
    return MarketplaceEngine(spark, sf_dir).conversations_list(42)
