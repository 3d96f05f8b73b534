"""Deploy bundles (deploy.py): package table metadata + serialized
query routes into one artifact, validate against a live catalog, serve
(reference serving/deploy.py build_deploy_bundle contract)."""
import json
import urllib.request

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import deploy
from pixeltable_spark.exceptions import Error, NotFoundError


@pytest.fixture()
def cat(spark, tmp_path):
    c = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = c.create_table("m", {"k": pxt.Int(False), "v": pxt.Float()})
    t.insert([{"k": i, "v": float(i) * 1.5} for i in range(10)])
    return c


class TestBundleRoundtrip:
    def test_build_load_execute(self, cat, tmp_path):
        t = cat.get_table("m")
        q = (t.where(t.ref().k >= 5)
             .select(t.ref().k, doubled=t.ref().v * 2))
        p = deploy.build_deploy_bundle(
            cat, "demo", str(tmp_path / "b.tar.gz"),
            routes={"big_k": q, "raw": {"table": "m", "kind": "rows"}})
        bundle = deploy.load_deploy_bundle(cat, p)
        assert bundle["name"] == "demo"
        assert set(bundle["routes"]) == {"big_k", "raw"}
        rows = bundle["routes"]["big_k"]["_bound"].collect()
        assert sorted(r["k"] for r in rows) == [5, 6, 7, 8, 9]
        assert rows[0]["doubled"] == rows[0]["k"] * 1.5 * 2

    def test_served_routes(self, cat, tmp_path):
        t = cat.get_table("m")
        q = t.select(t.ref().k, v2=t.ref().v).order_by(t.ref().k)
        p = deploy.build_deploy_bundle(
            cat, "svc", str(tmp_path / "b2.tar.gz"),
            routes={"all": q, "ins": {"table": "m", "kind": "insert"}})
        srv = deploy.serve_bundle(cat, p)
        try:
            ep = f"http://{srv.host}:{srv.port}"
            with urllib.request.urlopen(f"{ep}/deployed", timeout=10) as r:
                idx = json.loads(r.read())
            assert idx["name"] == "svc" and idx["routes"] == ["all", "ins"]
            req = urllib.request.Request(
                f"{ep}/deployed/all", method="POST",
                data=json.dumps({"limit": 3}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                rows = json.loads(r.read())["rows"]
            assert [x["k"] for x in rows] == [0, 1, 2]
            req = urllib.request.Request(
                f"{ep}/deployed/ins", method="POST",
                data=json.dumps({"rows": [{"k": 99, "v": 0.5}]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                assert json.loads(r.read())["num_rows"] == 1
            assert cat.get_table("m").count() == 11
        finally:
            srv.stop()

    def test_validation_missing_table(self, cat, tmp_path, spark):
        p = deploy.build_deploy_bundle(
            cat, "x", str(tmp_path / "b3.tar.gz"), tables=["m"])
        other = pxt.Catalog(spark, str(tmp_path / "wh_other"))
        with pytest.raises(NotFoundError):
            deploy.load_deploy_bundle(other, p)

    def test_validation_type_drift(self, cat, tmp_path):
        p = deploy.build_deploy_bundle(
            cat, "x", str(tmp_path / "b4.tar.gz"), tables=["m"])
        cat.get_table("m").alter_column("v", pxt.String())
        with pytest.raises(Error, match="FLOAT"):
            deploy.load_deploy_bundle(cat, p)

    def test_pinned_version_validated(self, cat, tmp_path):
        t = cat.get_table("m")
        p = deploy.build_deploy_bundle(
            cat, "x", str(tmp_path / "b5.tar.gz"), tables=["m"],
            pin_versions=True)
        b = deploy.load_deploy_bundle(cat, p)
        assert b["tables"]["m"]["version"] == t.version

    def test_bad_route_spec(self, cat, tmp_path):
        with pytest.raises(ValueError, match="route"):
            deploy.build_deploy_bundle(
                cat, "x", str(tmp_path / "b6.tar.gz"),
                routes={"bad": 42})


class TestDeployCli:
    def test_deploy_build_cli(self, cat, tmp_path):
        import subprocess
        import sys as _sys
        wh = cat.root
        out = str(tmp_path / "cli_bundle.tar.gz")
        r = subprocess.run(
            [_sys.executable, "-m", "pixeltable_spark.cli",
             "--home", wh, "deploy-build", "svc", out,
             "--route", "feed=m:rows"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr[-1500:]
        assert out in r.stdout
        b = deploy.load_deploy_bundle(cat, out)
        assert b["routes"]["feed"] == {"kind": "rows", "table": "m"}
