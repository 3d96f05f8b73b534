"""Layered config (config.py vs reference config.py): env > config file
> pyproject section; typed gets; session/home consume it. No Spark
session needed — pure precedence logic."""

from __future__ import annotations

import pytest

import pixeltable_spark.config as C


@pytest.fixture(autouse=True)
def _restore_config():
    """The module caches the loaded Config; re-load with the restored
    environment after each test so later suites see real settings."""
    yield
    C.get_config(reload=True)


def _fresh(monkeypatch, tmp_path, toml_text=None, pyproject=None,
           env=None):
    for var in list("PIXELTABLE_SPARK_CONFIG"
                    ",PIXELTABLE_SPARK_SPARK_CPUS"
                    ",PIXELTABLE_SPARK_CORE_HOME"
                    ",PIXELTABLE_SPARK_HOME,SPARK_GRAFT_CPUS".split(",")):
        monkeypatch.delenv(var, raising=False)
    if toml_text is not None:
        f = tmp_path / "config.toml"
        f.write_text(toml_text)
        monkeypatch.setenv("PIXELTABLE_SPARK_CONFIG", str(f))
    if pyproject is not None:
        (tmp_path / "pyproject.toml").write_text(pyproject)
        monkeypatch.chdir(tmp_path)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    return C.get_config(reload=True)


class TestConfig:
    def test_defaults_without_any_source(self, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        cfg = _fresh(monkeypatch, tmp_path)
        assert cfg.source is None
        assert cfg.get("spark", "cpus", "32") == "32"

    def test_file_values_and_sections(self, monkeypatch, tmp_path):
        cfg = _fresh(monkeypatch, tmp_path, toml_text="""
home = "/data/store"
[spark]
cpus = 8
shuffle_partitions = 16
[openai]
api_key = "sk-test"
""")
        # bare top-level key relocates to core
        assert cfg.get("core", "home") == "/data/store"
        assert cfg.get("spark", "cpus", "32") == "8"  # typed to default's type
        assert cfg.get("openai", "api_key") == "sk-test"

    def test_env_beats_file(self, monkeypatch, tmp_path):
        cfg = _fresh(monkeypatch, tmp_path,
                     toml_text="[spark]\ncpus = 8\n",
                     env={"PIXELTABLE_SPARK_SPARK_CPUS": "4"})
        assert cfg.get("spark", "cpus", "32") == "4"

    def test_legacy_env_alias_beats_everything(self, monkeypatch, tmp_path):
        cfg = _fresh(monkeypatch, tmp_path,
                     toml_text="[spark]\ncpus = 8\n",
                     env={"PIXELTABLE_SPARK_SPARK_CPUS": "4",
                          "SPARK_GRAFT_CPUS": "2"})
        assert cfg.get("spark", "cpus", "32", env="SPARK_GRAFT_CPUS") == "2"

    def test_pyproject_fallback(self, monkeypatch, tmp_path):
        cfg = _fresh(monkeypatch, tmp_path, pyproject="""
[tool.pixeltable_spark]
home = "/pp/store"
[tool.pixeltable_spark.spark]
driver_memory = "8g"
""")
        assert cfg.get("core", "home") == "/pp/store"
        assert cfg.get("spark", "driver_memory", "48g") == "8g"

    def test_typed_conversion(self, monkeypatch, tmp_path):
        cfg = _fresh(monkeypatch, tmp_path,
                     toml_text="[spark]\nshuffle_partitions = \"24\"\nverbose = \"yes\"\n")
        assert cfg.get("spark", "shuffle_partitions", 32) == 24
        assert cfg.get("spark", "verbose", False) is True

    def test_home_consumes_config(self, monkeypatch, tmp_path):
        _fresh(monkeypatch, tmp_path, toml_text='home = "/cfg/store"\n')
        from pixeltable_spark.globals_api import home
        assert home() == "/cfg/store"
        monkeypatch.setenv("PIXELTABLE_SPARK_HOME", "/env/store")
        assert home() == "/env/store"
