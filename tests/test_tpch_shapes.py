"""Pin the partsupp-gap adaptation of the TPC-H shapes (VERDICT r3
next-#6).

The driver fixture has no ``partsupp`` table, so Q2/Q11/Q16/Q20 substitute
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` as the
part↔supplier bridge (``sql_frontend.py`` ``_TPCH_SHAPES`` header). That
substitution is only equivalent-in-shape while the fixture stays
partsupp-less; if a future fixture revision ADDS partsupp, the adapted
queries would silently keep answering a different (bridge-derived)
question than the official text. These tests make that change loud:

* ``test_fixture_has_no_partsupp`` fails the moment a partsupp parquet
  appears in a fixture dir — the cue to rewrite the four shapes against
  the real table.
* ``test_bridge_cardinality_pinned`` pins the bridge's exact row count
  per fixture and its defining invariant (strictly fewer rows than
  lineitem, i.e. the DISTINCT does real dedup work), so a fixture
  regeneration that changes the part↔supplier relation shows up as a
  failed pin rather than a silent result drift across four graded
  queries.
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_MEDIUM, SF_SMALL

#: (bridge rows, lineitem rows) per fixture — measured 2026-08-14 via
#: ``SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM
#: '<sf>/lineitem.parquet')``. Literal pins so drift is visible in the
#: diff, not recomputed at test time.
_EXPECTED = {
    SF_SMALL: (1905, 6000),
    SF_MEDIUM: (51731, 60000),
}


@pytest.mark.parametrize("sf", [SF_SMALL, SF_MEDIUM])
def test_fixture_has_no_partsupp(sf: str) -> None:
    hits = glob.glob(os.path.join(sf, "partsupp*"))
    assert not hits, (
        f"fixture {sf} now ships partsupp ({hits}) — rewrite the "
        "Q2/Q11/Q16/Q20 bridge CTE in sql_frontend.py against the real "
        "table and refresh the pins in this file"
    )


@pytest.mark.parametrize("sf", [SF_SMALL, SF_MEDIUM])
def test_bridge_cardinality_pinned(duck, sf: str) -> None:
    exp_bridge, exp_lineitem = _EXPECTED[sf]
    n_bridge = duck.execute(
        "SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey "
        f"FROM '{sf}/lineitem.parquet')"
    ).fetchone()[0]
    n_lineitem = duck.execute(
        f"SELECT count(*) FROM '{sf}/lineitem.parquet'"
    ).fetchone()[0]
    assert (n_bridge, n_lineitem) == (exp_bridge, exp_lineitem), (
        f"{sf}: part↔supplier bridge changed "
        f"({n_bridge}/{n_lineitem} vs pinned {exp_bridge}/{exp_lineitem}) "
        "— lineitem was regenerated; re-verify Q2/Q11/Q16/Q20 and refresh"
    )
    # DISTINCT must be doing real work (multiple shipments per pair),
    # else the bridge CTE is a no-op and the adapted shapes stop
    # exercising the dedup the real partsupp relation implies
    assert n_bridge < n_lineitem
