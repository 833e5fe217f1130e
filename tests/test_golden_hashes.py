"""Golden value-hashes for the DETERMINISTIC rows-only driver queries.

These queries have no DuckDB oracle (iterative fixpoints or xxhash64-driven
rules SQL cannot express), so the driver's CORRECTNESS artifact records only
a rows-match for them. But their outputs are exactly deterministic — integer
structural results, reproducible at any parallelism (partition invariance is
property-tested in test_properties.py / test_bipartite.py) — so this file
pins the driver-canonicalized sha256 of each result at sf0.01, using the
driver harness's OWN canonicalizer imported from scripts/preflight.py (no
duplicated logic to drift). A hash change here means the algorithm's output
changed, not a formatting accident.

Exactness of the underlying algorithms vs independent oracles (networkx /
pure-python simulation) is pinned separately in test_graph_algos.py and
test_bipartite.py; this file converts that evidence into the same value-hash
currency the driver artifact uses.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "preflight", os.path.join(_REPO, "scripts", "preflight.py")
)
_pf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_pf)

SF001 = "/root/testdata/sf0.01"

# name -> (expected row count, expected driver-canonical value hash),
# computed at sf0.01; independent of cores/shuffle-partitions by the
# engines' hash-random / fixpoint determinism.
GOLDEN = {
    "k5_lpa_community_sizes": (2, "29a843ae80ad22f2"),
    "k10_kcore": (2000, "4d920d4798ea580f"),
    "k18_random_walks": (2000, "1033a8fc026b0df6"),
    "k24_ktruss": (100, "0bb511d96ccdfc29"),
    "k27_coreness": (2000, "ffe3794fce846eb2"),
    "k29_mis": (2000, "fb94e77065599eb1"),
    "k30_coloring": (2000, "c45e28f48e746573"),
}


@pytest.mark.skipif(
    not os.path.isdir(SF001), reason="sf0.01 fixtures not present"
)
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_hash(spark, name):
    sys.path.insert(0, _REPO)
    import __spark_entry__ as se

    df = _pf.canon(se.queries()[name](spark, SF001).toPandas())
    n_rows, want = GOLDEN[name]
    assert len(df) == n_rows
    assert _pf.value_hash(df) == want
