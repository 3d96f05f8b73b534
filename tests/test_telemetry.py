"""Telemetry hooks (pixeltable_spark/telemetry.py): inert by default,
span structure + attrs when subscribed, catalog ops instrumented."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import telemetry


@pytest.fixture()
def collector():
    sub = telemetry.CollectingSubscriber()
    key = telemetry.subscribe(sub)
    yield sub
    telemetry.unsubscribe(key)


class TestTelemetryCore:
    def test_inert_without_subscribers(self):
        assert not telemetry.active()
        assert telemetry.span_start("x") is None
        telemetry.span_end(None)  # no-op
        telemetry.emit("nothing")  # no-op

    def test_span_nesting_and_duration(self, collector):
        with telemetry.span("outer", attrs={"a": 1}) as outer:
            assert telemetry.current_span() is outer
            with telemetry.span("inner") as inner:
                assert inner.parent_id == outer.span_id
        assert telemetry.current_span() is None
        names = [s.name for s in collector.spans]
        assert names == ["inner", "outer"]  # end order
        assert all(s.duration_ms >= 0 for s in collector.spans)
        assert collector.spans[1].attrs == {"a": 1}

    def test_exception_recorded_and_reraised(self, collector):
        captured = []

        class Sub(telemetry.Subscriber):
            def on_span_end(self, span, exc):
                captured.append((span.name, type(exc).__name__ if exc else None))

        key = telemetry.subscribe(Sub())
        try:
            with pytest.raises(ValueError):
                with telemetry.span("boom"):
                    raise ValueError("x")
        finally:
            telemetry.unsubscribe(key)
        assert ("boom", "ValueError") in captured

    def test_level_filtering(self, collector):
        telemetry.set_span_level(telemetry.INFO)
        with telemetry.span("dbg", level=telemetry.DEBUG):
            pass
        assert all(s.name != "dbg" for s in collector.spans)
        telemetry.set_span_level(telemetry.DEBUG)
        try:
            with telemetry.span("dbg2", level=telemetry.DEBUG):
                pass
        finally:
            telemetry.set_span_level(telemetry.INFO)
        assert any(s.name == "dbg2" for s in collector.spans)

    def test_lazy_attrs_only_computed_when_active(self):
        calls = []

        def attrs():
            calls.append(1)
            return {"x": 1}

        with telemetry.span("quiet", attrs=attrs):
            pass
        assert calls == []  # no subscriber -> never computed

    def test_events(self, collector):
        telemetry.emit("cache.hit", {"key": "k1"})
        assert ("cache.hit", {"key": "k1"}) in collector.events

    def test_subscriber_errors_never_break_op(self):
        class Bad(telemetry.Subscriber):
            def on_span_start(self, span):
                raise RuntimeError("subscriber bug")

            def on_span_end(self, span, exc):
                raise RuntimeError("subscriber bug")

        key = telemetry.subscribe(Bad())
        try:
            with telemetry.span("robust"):
                pass  # must not raise
        finally:
            telemetry.unsubscribe(key)


class TestEngineInstrumentation:
    def test_catalog_ops_emit_spans(self, spark, tmp_path, collector,
                                    monkeypatch):
        import pixeltable_spark.globals_api as g
        monkeypatch.setattr(g, "_catalog", None)
        g.init(spark=spark, home_dir=str(tmp_path / "wh"))
        t = g.create_table("tele_t", {"x": pxt.Int})
        t.insert([{"x": 1}, {"x": 2}])
        t.update({"x": t.x + 1})
        t.delete(where=t.x > 2)
        t.revert()
        names = [s.name for s in collector.spans]
        for expected in ["table.insert", "table.update", "table.delete",
                         "table.revert"]:
            assert expected in names, names
        ins = next(s for s in collector.spans if s.name == "table.insert")
        assert ins.attrs["table"] == "tele_t"
        monkeypatch.setattr(g, "_catalog", None)

    def test_query_compile_span(self, spark, collector):
        df = spark.createDataFrame([(1, "a")], "k long, s string")
        t = pxt.TableRef.from_df(df, "tele_q", rowid_cols=["k"])
        t.select(t.k).collect()
        assert any(s.name == "query.compile" for s in collector.spans)

    def test_otel_bridge_gated(self):
        try:
            import opentelemetry  # noqa: F401
            has = True
        except ImportError:
            has = False
        if not has:
            with pytest.raises(ImportError):
                telemetry.instrument_opentelemetry()
