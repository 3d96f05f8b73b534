"""The five non-SQL-expressible queries (q70 PQ-ANN, q88 SemDeDup,
q91 BPE, q92 LSA, q95 ICWS) checked cell-exact against their
pure-python/numpy replay oracles (tools/py_oracles.py) — upgrading them
from the driver's rows-only standing to value-verified in the repo gate."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("qname", [
    "q70_pq_ann", "q88_semdedup", "q91_bpe_tokenize",
    "q92_lsa_semantic_dedup", "q95_icws_pairs",
])
def test_replay_oracle_matches(spark, qname):
    import __spark_entry__ as entrymod
    from check_correctness import compare_py
    from py_oracles import PY_ORACLES

    if not os.path.isdir(SF):
        pytest.skip("driver testdata not present")
    sdf = entrymod.queries()[qname](spark, SF)
    res = compare_py(qname, sdf, PY_ORACLES[qname], SF)
    assert res.startswith("OK"), res
    assert "EXACT" in res, res
