"""Lightweight telemetry hooks: named spans + events with pluggable
subscribers (the analog of the reference's ``pixeltable/telemetry.py``
surface — span levels, subscriber registry, contextvar nesting — which
its OpenTelemetry package instruments; reference telemetry.py:27-267).

Inert by default: with no subscriber registered every call is a cheap
no-op (one registry check), so instrumented engine code costs nothing in
production unless observability is switched on. Subscribers receive
(span_start, span_end, event) callbacks and can bridge to any backend;
:func:`instrument_opentelemetry` wires a real OTel tracer when the
``opentelemetry`` library is installed (absent in this container — the
bridge is import-gated, everything else is stdlib).

Spark note: spans live on the DRIVER (plan construction, catalog
commits, job submission). Executor-side work is observable through
Spark's own metrics system; driver spans carry the query/operation
structure those metrics lack.
"""

from __future__ import annotations

import time
import uuid
from contextlib import contextmanager
from contextvars import ContextVar
from typing import Any, Callable, Iterator, Optional

TRACE = 5
DEBUG = 10
INFO = 20

_LEVEL = INFO
_subscribers: dict[Any, "Subscriber"] = {}


class Subscriber:
    """Receives span/event callbacks. Subclass or pass callables to
    :func:`subscribe`."""

    def on_span_start(self, span: "SpanHandle") -> None:  # noqa: D102
        pass

    def on_span_end(self, span: "SpanHandle",
                    exc: Optional[BaseException]) -> None:  # noqa: D102
        pass

    def on_event(self, name: str, attrs: dict) -> None:  # noqa: D102
        pass


class SpanHandle:
    __slots__ = ("name", "span_id", "parent_id", "level", "attrs",
                 "start_ns", "end_ns", "_token")

    def __init__(self, name: str, level: int,
                 parent: Optional["SpanHandle"], attrs: dict):
        self.name = name
        self.span_id = uuid.uuid4().hex[:16]
        self.parent_id = parent.span_id if parent is not None else None
        self.level = level
        self.attrs = attrs
        self.start_ns = time.monotonic_ns()
        self.end_ns: Optional[int] = None

    @property
    def duration_ms(self) -> Optional[float]:
        if self.end_ns is None:
            return None
        return (self.end_ns - self.start_ns) / 1e6


_current_span: ContextVar[Optional[SpanHandle]] = ContextVar(
    "pxt_spark_current_span", default=None)


def active() -> bool:
    """True when at least one subscriber is registered — instrumented
    code guards expensive attribute computation on this."""
    return bool(_subscribers)


def set_span_level(level: int) -> None:
    global _LEVEL
    _LEVEL = level


def current_span() -> Optional[SpanHandle]:
    return _current_span.get()


def subscribe(sub: Subscriber, key: Any = None) -> Any:
    key = key if key is not None else id(sub)
    _subscribers[key] = sub
    return key


def unsubscribe(key: Any) -> None:
    _subscribers.pop(key, None)


def _resolve(attrs) -> dict:
    if attrs is None:
        return {}
    if callable(attrs):  # lazy attrs: only computed when someone listens
        attrs = attrs()
    return dict(attrs)


def span_start(name: str, level: int = INFO, attrs=None) -> Optional[SpanHandle]:
    if not _subscribers or level < _LEVEL:
        return None
    handle = SpanHandle(name, level, _current_span.get(), _resolve(attrs))
    handle._token = _current_span.set(handle)  # type: ignore[attr-defined]
    for s in list(_subscribers.values()):
        try:
            s.on_span_start(handle)
        except Exception:  # noqa: BLE001 — telemetry must never break the op
            pass
    return handle


def span_end(handle: Optional[SpanHandle], *,
             exc: Optional[BaseException] = None, attrs=None) -> None:
    if handle is None:
        return
    handle.end_ns = time.monotonic_ns()
    if attrs:
        handle.attrs.update(_resolve(attrs))
    token = getattr(handle, "_token", None)
    if token is not None:
        _current_span.reset(token)
    for s in list(_subscribers.values()):
        try:
            s.on_span_end(handle, exc)
        except Exception:  # noqa: BLE001
            pass


def add_attrs(handle: Optional[SpanHandle], **attrs: Any) -> None:
    if handle is not None:
        handle.attrs.update(attrs)


def emit(name: str, attrs=None) -> None:
    """Point-in-time event (no duration)."""
    if not _subscribers:
        return
    resolved = _resolve(attrs)
    for s in list(_subscribers.values()):
        try:
            s.on_event(name, resolved)
        except Exception:  # noqa: BLE001
            pass


@contextmanager
def span(name: str, level: int = INFO, attrs=None) -> Iterator[Optional[SpanHandle]]:
    handle = span_start(name, level, attrs)
    try:
        yield handle
    except BaseException as e:
        span_end(handle, exc=e)
        raise
    else:
        span_end(handle)


class CollectingSubscriber(Subscriber):
    """Test/debug subscriber: records finished spans + events in lists."""

    def __init__(self) -> None:
        self.spans: list[SpanHandle] = []
        self.events: list[tuple] = []

    def on_span_end(self, span: SpanHandle,
                    exc: Optional[BaseException]) -> None:
        self.spans.append(span)

    def on_event(self, name: str, attrs: dict) -> None:
        self.events.append((name, attrs))


def instrument_opentelemetry(tracer_provider: Any = None) -> Any:
    """Bridge spans to OpenTelemetry when the library is installed
    (the reference ships this as a separate package — reference
    packages/opentelemetry-instrumentation-pixeltable/_sdk.py).
    Returns the subscription key; raises ImportError offline."""
    from opentelemetry import trace  # noqa: PLC0415 — import-gated

    tracer = trace.get_tracer("pixeltable_spark", tracer_provider=tracer_provider) \
        if tracer_provider is not None else trace.get_tracer("pixeltable_spark")

    class _OtelSub(Subscriber):
        def __init__(self) -> None:
            self._live: dict[str, Any] = {}

        def on_span_start(self, s: SpanHandle) -> None:
            self._live[s.span_id] = tracer.start_span(s.name,
                                                      attributes=s.attrs)

        def on_span_end(self, s: SpanHandle,
                        exc: Optional[BaseException]) -> None:
            os_ = self._live.pop(s.span_id, None)
            if os_ is None:
                return
            for k, v in s.attrs.items():
                os_.set_attribute(k, v)
            if exc is not None:
                os_.record_exception(exc)
            os_.end()

        def on_event(self, name: str, attrs: dict) -> None:
            cur = trace.get_current_span()
            if cur is not None:
                cur.add_event(name, attributes=attrs)

    return subscribe(_OtelSub(), key="otel")


def traced(name: str, level: int = INFO,
           attrs_fn: Optional[Callable] = None) -> Callable:
    """Method decorator: wrap the call in a span when telemetry is
    active; zero-cost (single dict check) otherwise. ``attrs_fn`` gets
    the call's (self, *args, **kwargs) and returns span attributes —
    only invoked when a subscriber listens."""
    import functools

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            if not _subscribers:
                return fn(*args, **kwargs)
            lazy = (lambda: attrs_fn(*args, **kwargs)) if attrs_fn else None
            with span(name, level, attrs=lazy):
                return fn(*args, **kwargs)
        return wrapper
    return deco
