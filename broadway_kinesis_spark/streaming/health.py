"""Health registry — readiness signaling for streaming sources.

Re-expression of the reference's `BroadwayKinesis.ProducerRegistry`
(`producer_registry.ex:25-97`): per-stream boolean liveness, an all-ready
predicate, and a manual override — as a plain in-process object fed by a
`StreamingQueryListener` instead of a GenServer fed by producer processes
(SURVEY.md §7 hard part (d): listeners, not actors).

Semantics carried over 1:1 (each with the reference's behavior cited):

- ``register``      — idempotent `Map.put_new` (`producer_registry.ex:50`):
                      re-registering never resets an existing value; streams
                      start not-ready.
- ``unregister``    — tolerant `Map.drop` (`:60`): unknown streams are a
                      no-op.
- ``update_value``  — boolean-only guard (`:65-76`, test `:57-61`); updates
                      to unregistered streams are ignored.
- ``producers_ready`` — AND over all registered streams (`:82-93`); an empty
                      registry is vacuously ready (Enum.all?/1 on []).
- ``set_ready_override`` — manual True/False override, None clears
                      (`:78-80, 95-97`).

`SparkHealthListener` bridges Structured Streaming lifecycle events into the
registry: query started -> registered, progress observed -> ready,
terminated -> not ready (error or not — a stopped stream is not serving).
Attach with ``spark.streams.addListener(listener)``.
"""

from __future__ import annotations

import threading

try:  # the listener needs a running Spark session; the registry does not
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class HealthRegistry:
    """Thread-safe per-stream readiness registry (A17)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._streams: dict[str, bool] = {}
        self._override: bool | None = None

    def register(self, stream: str) -> None:
        with self._lock:
            self._streams.setdefault(stream, False)

    def unregister(self, stream: str) -> None:
        with self._lock:
            self._streams.pop(stream, None)

    def update_value(self, stream: str, value: bool) -> None:
        if not isinstance(value, bool):
            raise TypeError(f"readiness must be a bool, got {type(value).__name__}")
        with self._lock:
            if stream in self._streams:
                self._streams[stream] = value

    def ready(self, stream: str) -> bool:
        with self._lock:
            return self._streams.get(stream, False)

    def producers_ready(self) -> bool:
        with self._lock:
            if self._override is not None:
                return self._override
            return all(self._streams.values())

    def set_ready_override(self, value: bool | None) -> None:
        if value is not None and not isinstance(value, bool):
            raise TypeError(f"override must be a bool or None, got {type(value).__name__}")
        with self._lock:
            self._override = value

    def snapshot(self) -> dict[str, bool]:
        with self._lock:
            return dict(self._streams)


class SparkHealthListener(StreamingQueryListener):
    """StreamingQueryListener -> HealthRegistry bridge.

    Streams are keyed by query name (fall back to query id). The reference's
    producer updated its registry entry on every successful/failed stream
    message (`producer.ex:83-133`); here every progress event marks ready
    and termination marks not-ready.
    """

    def __init__(self, registry: HealthRegistry) -> None:
        self.registry = registry

    @staticmethod
    def _key(event) -> str:
        name = getattr(event, "name", None)
        return name if name else str(event.id)

    def onQueryStarted(self, event) -> None:
        self.registry.register(self._key(event))

    def onQueryProgress(self, event) -> None:
        key = event.progress.name or str(event.progress.id)
        self.registry.register(key)
        self.registry.update_value(key, True)

    def onQueryIdle(self, event) -> None:
        # Idle = connected but no new data: still healthy.
        key = self._key(event)
        self.registry.register(key)
        self.registry.update_value(key, True)

    def onQueryTerminated(self, event) -> None:
        self.registry.update_value(self._key(event), False)
