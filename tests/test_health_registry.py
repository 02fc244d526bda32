"""HealthRegistry behavior — pytest port of the reference's
producer_registry_test.exs matrix (SURVEY.md §5: register dedup :20-24,
unregister-missing tolerance :34-40, boolean-only guard :57-61, all-ready
AND :64-111, manual override :114-147)."""

from __future__ import annotations

import pytest

from broadway_kinesis_spark.streaming.health import HealthRegistry


@pytest.fixture()
def reg():
    return HealthRegistry()


def test_register_is_idempotent_and_preserves_value(reg):
    reg.register("stream-a")
    reg.update_value("stream-a", True)
    reg.register("stream-a")  # Map.put_new: must NOT reset to False
    assert reg.ready("stream-a") is True


def test_streams_start_not_ready(reg):
    reg.register("stream-a")
    assert reg.ready("stream-a") is False
    assert reg.producers_ready() is False


def test_unregister_missing_is_tolerated(reg):
    reg.unregister("never-registered")  # no raise (Map.drop semantics)
    reg.register("stream-a")
    reg.unregister("stream-a")
    reg.unregister("stream-a")
    assert reg.snapshot() == {}


def test_update_value_boolean_only_guard(reg):
    reg.register("stream-a")
    for bad in (1, 0, "true", None, [True]):
        with pytest.raises(TypeError):
            reg.update_value("stream-a", bad)
    assert reg.ready("stream-a") is False


def test_update_value_on_unregistered_stream_is_ignored(reg):
    reg.update_value("ghost", True)
    assert reg.snapshot() == {}
    assert reg.ready("ghost") is False


def test_producers_ready_is_and_over_all_streams(reg):
    assert reg.producers_ready() is True  # vacuous truth on empty registry
    reg.register("a")
    reg.register("b")
    assert reg.producers_ready() is False
    reg.update_value("a", True)
    assert reg.producers_ready() is False
    reg.update_value("b", True)
    assert reg.producers_ready() is True
    reg.update_value("a", False)
    assert reg.producers_ready() is False
    reg.unregister("a")
    assert reg.producers_ready() is True


def test_ready_override(reg):
    reg.register("a")  # not ready
    assert reg.producers_ready() is False
    reg.set_ready_override(True)
    assert reg.producers_ready() is True
    reg.set_ready_override(None)
    assert reg.producers_ready() is False
    reg.update_value("a", True)
    reg.set_ready_override(False)
    assert reg.producers_ready() is False
    with pytest.raises(TypeError):
        reg.set_ready_override("yes")


def test_listener_bridge_marks_progress_and_termination(reg):
    from broadway_kinesis_spark.streaming.health import SparkHealthListener

    class Obj:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    listener = SparkHealthListener(reg)
    listener.onQueryStarted(Obj(name="q1", id="id-1"))
    assert reg.snapshot() == {"q1": False}
    listener.onQueryProgress(Obj(progress=Obj(name="q1", id="id-1")))
    assert reg.ready("q1") is True
    assert reg.producers_ready() is True
    listener.onQueryTerminated(Obj(name="q1", id="id-1"))
    assert reg.ready("q1") is False
