"""Manifest format_version stamp + upgrade hook (catalog.py
_load_manifest; reference parity: metadata/__init__.py VERSION /
register_converter) and the stratified-sampling cardinality guard."""

import json
import os

import pytest

import pixeltable_spark as pxt
from pixeltable_spark.catalog import MANIFEST_FORMAT_VERSION


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "warehouse"))


def _mk(cat, name="t"):
    t = cat.create_table(name, {"k": pxt.Int(False), "v": pxt.Float(True)},
                         primary_key=["k"])
    t.insert([{"k": i, "v": float(i)} for i in range(10)])
    return t


def _current(t):
    with open(os.path.join(t.path, "CURRENT")) as f:
        return json.load(f)


class TestManifestVersion:
    def test_new_commits_are_stamped(self, cat):
        t = _mk(cat)
        cur = _current(t)
        assert cur["format_version"] == MANIFEST_FORMAT_VERSION
        with open(os.path.join(t.path, cur["manifest"])) as f:
            m = json.load(f)
        assert m["format_version"] == MANIFEST_FORMAT_VERSION

    def test_v1_unstamped_manifest_opens_and_restamps(self, cat):
        t = _mk(cat)
        cur = _current(t)
        mpath = os.path.join(t.path, cur["manifest"])
        with open(mpath) as f:
            m = json.load(f)
        # simulate a pre-round-7 warehouse: strip the stamps
        del m["format_version"]
        with open(mpath, "w") as f:
            json.dump(m, f)
        del cur["format_version"]
        with open(os.path.join(t.path, "CURRENT"), "w") as f:
            json.dump(cur, f)
        # reads fine (v1 -> v2 upgrade is in-memory)
        assert t.count() == 10
        # the next commit re-stamps
        t.insert([{"k": 100, "v": 1.0}])
        assert _current(t)["format_version"] == MANIFEST_FORMAT_VERSION
        assert t.count() == 11

    def test_newer_version_refused_with_message(self, cat):
        t = _mk(cat)
        cur = _current(t)
        mpath = os.path.join(t.path, cur["manifest"])
        with open(mpath) as f:
            m = json.load(f)
        m["format_version"] = MANIFEST_FORMAT_VERSION + 7
        with open(mpath, "w") as f:
            json.dump(m, f)
        # a fresh handle (new build opening this warehouse) must refuse;
        # the live handle's resolver cache is bypassed by reloading
        t2 = pxt.Catalog(t.catalog.spark, t.catalog.root).get_table("t")
        with pytest.raises(RuntimeError, match="format_version.*upgrade"):
            t2.count()


class TestStratifyCardinalityGuard:
    def test_fine_grained_key_errors_with_guidance(self, cat, monkeypatch):
        import pixeltable_spark.plans.query as qmod
        t = _mk(cat)  # 10 rows, unique k -> 10 strata
        monkeypatch.setattr(qmod, "MAX_STRATA", 5)
        q = t.sample(n=4, stratify_by=[t.k], seed=1)
        with pytest.raises(ValueError,
                           match="coarser key.*fraction|distinct strata"):
            q.collect()

    def test_under_cap_unchanged(self, cat):
        t = _mk(cat)
        q = t.sample(n=4, stratify_by=[t.k], seed=1)
        assert len(q.collect()) == 4
