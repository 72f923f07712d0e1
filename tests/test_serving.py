"""Pipelined serving loop: deferred fetch must not change results.

The reference frame loops are synchronous (``vis_tracking.py:70-138``);
``d3fields_tpu.serving`` overlaps device compute with host consumption.
These tests pin the contract: bit-identical outputs, in-order delivery,
and the degenerate depth=0 == synchronous case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3fields_tpu.serving import (
    AsyncFrameLoop, host_prefetch, prefetch_to_device,
)


@jax.jit
def _step(carry, x):
    carry = carry * 0.9 + x
    return carry, {"out": carry * 2.0, "tag": jnp.sum(carry)}


def _run_sync(frames):
    carry = jnp.zeros(4)
    got = []
    for t, x in enumerate(frames):
        carry, out = _step(carry, x)
        got.append((t, jax.tree_util.tree_map(np.asarray, out)))
    return got


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_async_loop_matches_sync(depth):
    frames = [jnp.asarray(np.random.RandomState(t).randn(4).astype(np.float32))
              for t in range(6)]
    expect = _run_sync(frames)

    got = []
    loop = AsyncFrameLoop(lambda fid, out: got.append((fid, out)), depth=depth)
    carry = jnp.zeros(4)
    for t, x in enumerate(frames):
        carry, out = _step(carry, x)
        loop.submit(t, out)
        # the loop may hold at most `depth` frames in flight
        assert loop.in_flight <= depth
        # frames drain strictly in submit order with `depth` frames of lag
        assert len(got) == max(0, t + 1 - depth)
    loop.flush()
    assert loop.in_flight == 0
    assert loop.frames_consumed == len(frames)
    assert [fid for fid, _ in got] == [fid for fid, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        np.testing.assert_array_equal(a["out"], b["out"])
        np.testing.assert_array_equal(a["tag"], b["tag"])
        assert isinstance(a["out"], np.ndarray)  # fetched, not a device leaf


def test_depth_zero_is_synchronous():
    seen = []
    loop = AsyncFrameLoop(lambda fid, out: seen.append(fid), depth=0)
    loop.submit("a", jnp.ones(2))
    assert seen == ["a"]  # consumed inside submit, no lag


def test_non_array_leaves_pass_through():
    got = {}
    loop = AsyncFrameLoop(lambda fid, out: got.update(out), depth=0)
    loop.submit(0, {"x": jnp.arange(3), "label": "mug", "n": 7})
    assert got["label"] == "mug" and got["n"] == 7
    assert isinstance(got["x"], np.ndarray)


def test_context_manager_flushes_on_clean_exit_only():
    seen = []
    with AsyncFrameLoop(lambda fid, out: seen.append(fid), depth=8) as loop:
        for t in range(3):
            loop.submit(t, jnp.zeros(1))
        assert seen == []  # all in flight
    assert seen == [0, 1, 2]

    seen2 = []
    with pytest.raises(RuntimeError):
        with AsyncFrameLoop(lambda fid, out: seen2.append(fid), depth=8) as lp:
            lp.submit(0, jnp.zeros(1))
            raise RuntimeError("boom")
    assert seen2 == []  # no consumer work on the error path


def test_consumer_error_keeps_frame_queued_for_retry():
    """A transient consumer failure (e.g. ENOSPC mid-write) must not drop
    the frame: flush() after recovery delivers it."""
    fail = {"on": True}
    seen = []

    def consumer(fid, out):
        if fail["on"]:
            raise OSError("disk full")
        seen.append(fid)

    loop = AsyncFrameLoop(consumer, depth=1)
    loop.submit(0, jnp.zeros(1))
    with pytest.raises(OSError):
        loop.submit(1, jnp.zeros(1))  # forces a drain of frame 0 -> fails
    assert loop.in_flight == 2  # nothing lost
    fail["on"] = False
    loop.flush()
    assert seen == [0, 1]


def test_invalid_depth_rejected():
    with pytest.raises(ValueError):
        AsyncFrameLoop(lambda *a: None, depth=-1)


def test_prefetch_to_device_order_and_types():
    frames = [{"img": np.full((2, 2), t, np.float32), "t": t} for t in range(5)]
    out = list(prefetch_to_device(iter(frames), size=2))
    assert [f["t"] for f in out] == [0, 1, 2, 3, 4]
    for t, f in enumerate(out):
        assert isinstance(f["img"], jax.Array)
        np.testing.assert_array_equal(np.asarray(f["img"]), t)


def test_host_prefetch_order_and_overlap():
    import threading

    produced = []

    def gen():
        for i in range(20):
            produced.append(i)
            yield i

    out = list(host_prefetch(gen(), size=3))
    assert out == list(range(20)) and produced == out
    # no stray producer threads left behind
    assert not [t for t in threading.enumerate()
                if t.name == "host_prefetch" and t.is_alive()]


def test_host_prefetch_propagates_producer_error():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = host_prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_host_prefetch_early_close_stops_producer():
    import threading
    import time

    state = {"produced": 0}

    def gen():
        while True:
            state["produced"] += 1
            yield state["produced"]

    it = host_prefetch(gen(), size=2)
    assert next(it) == 1
    it.close()  # consumer abandons the stream
    time.sleep(0.5)
    # producer stopped near the queue bound instead of running away
    assert state["produced"] <= 8
    assert not [t for t in threading.enumerate()
                if t.name == "host_prefetch" and t.is_alive()]
    with pytest.raises(ValueError):
        list(host_prefetch([], size=0))


def test_prefetch_transform_and_short_streams():
    # size larger than the stream: still yields everything once
    out = list(prefetch_to_device([np.ones(1)], size=4,
                                  transform=lambda x: x * 3))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), 3)
    assert list(prefetch_to_device([], size=2)) == []
    with pytest.raises(ValueError):
        list(prefetch_to_device([], size=0))
