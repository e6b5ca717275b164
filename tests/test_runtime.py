"""Runtime tests: topics, latest-wins semantics, approx-time sync, node
threads, frame sources, profiler, compile cache, viz, and a full in-process
pipeline (source -> stereo node -> viz) — the single-machine analogue of
the reference's rostest harness (`caffe_ros/tests/tests_basic.launch`)."""

import dataclasses
import time

import numpy as np
import pytest

from conftest import requires_reference
from redtail_tpu.runtime import (
    ApproxTimeSync,
    NodeGraph,
    StageProfiler,
    Topic,
    disp_to_color,
    make_mosaic,
)
from redtail_tpu.runtime.sources import SyntheticSource


def test_topic_latest_wins():
    t = Topic("x")
    assert t.latest() is None
    t.publish(1)
    t.publish(2)
    m = t.latest()
    assert m.data == 2 and m.seq == 2
    assert t.take(last_seq=2) is None
    t.publish(3)
    assert t.take(last_seq=2).data == 3


def test_approx_time_sync():
    a, b = Topic("a"), Topic("b")
    sync = ApproxTimeSync(a, b, slop=0.05)
    a.publish("L", stamp=1.00)
    b.publish("R", stamp=1.20)
    assert sync.take() is None  # outside slop
    b.publish("R2", stamp=1.01)
    ma, mb = sync.take()
    assert (ma.data, mb.data) == ("L", "R2")
    assert sync.take() is None  # same pair not delivered twice


def test_node_graph_pipeline_threads():
    g = NodeGraph()
    out_log = []

    def double(x):
        return x * 2

    def collect(x):
        out_log.append(x)
        return None

    g.add_node("double", double, ["in"], "mid", max_rate_hz=200)
    g.add_node("collect", collect, ["mid"], None, max_rate_hz=200)
    g.start()
    try:
        for i in range(5):
            g.topic("in").publish(i)
            time.sleep(0.03)
        assert g.spin_until(lambda: len(out_log) >= 3, timeout=5)
    finally:
        g.stop()
    assert all(v % 2 == 0 for v in out_log)
    assert g.nodes["double"].errors == 0


def test_node_error_does_not_kill_loop():
    g = NodeGraph()

    def flaky(x):
        if x == 0:
            raise RuntimeError("boom")
        return x

    node = g.add_node("flaky", flaky, ["in"], "out", max_rate_hz=500)
    g.start()
    try:
        g.topic("in").publish(0)
        assert g.spin_until(lambda: node.errors >= 1, timeout=5)
        g.topic("in").publish(7)
        assert g.spin_until(lambda: node.processed >= 1, timeout=5)
        assert g.topic("out").latest().data == 7
    finally:
        g.stop()


def test_synthetic_source_rate():
    t = Topic("cam")
    src = SyntheticSource(t, shape=(8, 8, 3), rate_hz=100, count=10)
    src.start()
    # spin, not a fixed sleep: a loaded 1-core host can starve the
    # source thread well past the nominal 0.1 s this needs
    deadline = time.monotonic() + 10.0
    while src.published < 10 and time.monotonic() < deadline:
        time.sleep(0.01)
    src.stop()
    assert src.published == 10
    assert t.latest().data.shape == (8, 8, 3)


def test_profiler_report():
    p = StageProfiler()
    for _ in range(10):
        with p.stage("stage_a"):
            pass
    p.record("stage_b", 0.010)
    stats = p.stats()
    assert stats["stage_a"]["count"] == 10
    assert stats["stage_b"]["mean_ms"] == pytest.approx(10.0)
    assert "stage_a" in p.report()


def test_compilation_cache(tmp_path):
    import jax
    from redtail_tpu.runtime import enable_compilation_cache
    from redtail_tpu.runtime.cache import aot_compile

    d = enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").is_dir()
    compiled = aot_compile(lambda x: x * 2, np.ones((4,), np.float32))
    out = compiled(np.ones((4,), np.float32))
    np.testing.assert_array_equal(np.asarray(out), 2.0)


def test_disp_to_color():
    disp = np.linspace(0, 96, 64, dtype=np.float32).reshape(8, 8)
    rgb = disp_to_color(disp, 96.0)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    # zero disparity maps to black, max to ~white (the reference's float
    # math truncates 254.9997 -> 254 at the endpoint; same here)
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    assert all(c >= 254 for c in rgb[-1, -1])


def test_make_mosaic():
    left = np.zeros((8, 8, 3), np.uint8)
    right = np.ones((8, 8, 3), np.uint8)
    disp = np.full((8, 8), 48.0, np.float32)
    m = make_mosaic(left, right, disp)
    assert m.shape == (16, 16, 3)


def test_stereo_pipeline_end_to_end():
    """Camera pair -> StereoNode -> disparity topic, all in-process."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    node_fn = StereoNode(spec, init_stereo_params(spec))

    g = NodeGraph()
    g.add_node("stereo", node_fn, ["cam/left", "cam/right"],
               "stereo/disparity", max_rate_hz=100, sync_slop=0.05)
    rs = np.random.RandomState(0)
    frame_l = rs.randint(0, 256, (64, 128, 3), np.uint8)
    frame_r = rs.randint(0, 256, (64, 128, 3), np.uint8)
    g.start()
    try:
        stamp = time.monotonic()
        g.topic("cam/left").publish(frame_l, stamp=stamp)
        g.topic("cam/right").publish(frame_r, stamp=stamp)
        assert g.spin_until(
            lambda: g.topic("stereo/disparity").latest() is not None,
            timeout=60)
    finally:
        g.stop()
    disp = g.topic("stereo/disparity").latest().data
    assert disp.shape == (64, 128)
    assert np.isfinite(disp).all()
    # node stamps output with the source timestamp (reference contract)
    assert g.topic("stereo/disparity").latest().stamp == stamp


def test_telemetry_probes():
    from redtail_tpu.runtime.telemetry import Telemetry
    from redtail_tpu.control import Controller, ControllerConfig, Drone

    ctl = Controller(Drone(), ControllerConfig())
    records = []
    tel = Telemetry(interval_sec=0.01, sink=records.append)
    tel.add_controller(ctl)
    tel.add_probe("boom", lambda: 1 / 0)  # probes must not kill telemetry
    tel.sample()
    assert records[0]["state"] == "NOOP"
    assert records[0]["ai_score"] == 0.0
    assert "err" in records[0]["boom"]
    tel.start()
    # spin (not a fixed sleep): on a loaded 1-core host the sampler
    # thread can starve for hundreds of ms — only the COUNT matters
    deadline = time.monotonic() + 10.0
    while len(tel.records) <= 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    tel.stop()
    assert len(tel.records) > 3


def test_watchdog_detects_stalled_node():
    import threading
    g = NodeGraph()
    release = threading.Event()

    def wedge(x):
        release.wait(10)  # simulates a stage stuck in its callable
        return x

    node = g.add_node("wedge", wedge, ["in"], None, max_rate_hz=100)
    g.start()
    try:
        g.topic("in").publish(1)
        time.sleep(0.3)
        assert "wedge" in g.stalled_nodes(max_silence_sec=0.2)
    finally:
        release.set()
        g.stop()


def test_restart_node_recovers():
    g = NodeGraph()
    seen = []
    g.add_node("n", seen.append, ["in"], None, max_rate_hz=200)
    g.start()
    try:
        g.topic("in").publish(1)
        assert g.spin_until(lambda: len(seen) == 1, timeout=5)
        assert g.restart_node("n") is True  # clean join
        g.topic("in").publish(2)
        assert g.spin_until(lambda: len(seen) == 2, timeout=5)
    finally:
        g.stop()


def test_restart_wedged_node_no_double_publisher():
    """A thread wedged inside its callable must never re-enter the loop
    after a restart: only the replacement thread keeps consuming, so a
    topic sees one publisher (the round-1 restart race replaced the stop
    event and could leave TWO live loops on one output)."""
    import threading

    g = NodeGraph()
    release = threading.Event()
    calls = []

    def fn(x):
        calls.append(x)
        if x == "wedge":
            release.wait(10)
        return x

    node = g.add_node("n", fn, ["in"], "out", max_rate_hz=500)
    g.start()
    try:
        g.topic("in").publish("wedge")
        assert g.spin_until(lambda: len(calls) == 1, timeout=5)
        old_thread = node._thread
        assert g.restart_node("n", timeout=0.2) is False  # did not join
        assert node._thread is not old_thread
        # new thread consumes fresh input while the old one is still wedged
        g.topic("in").publish("a")
        assert g.spin_until(lambda: "a" in calls, timeout=5)
        # unwedge the old thread: it may finish its in-flight step but must
        # exit without consuming anything new
        release.set()
        assert g.spin_until(lambda: not old_thread.is_alive(), timeout=5)
        n_calls = len(calls)
        g.topic("in").publish("b")
        assert g.spin_until(lambda: "b" in calls, timeout=5)
        assert len(calls) == n_calls + 1  # exactly one consumer
    finally:
        release.set()
        g.stop()


def test_stage_device_pinning():
    """Each DNN stage pinned to its own device (the multi-chip analogue
    of the reference's one-ROS-process-per-DNN pipeline, SURVEY §2.4):
    outputs must be correct and computed on the assigned device."""
    import dataclasses

    import jax
    import numpy as np

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode, TrailNetNode

    devs = jax.devices()
    if len(devs) < 3:
        import pytest
        pytest.skip("needs >= 3 devices (conftest provides 8 virtual)")
    spec = dataclasses.replace(STEREO_SPECS["nvtiny"], input_hw=(32, 64),
                               max_disp=4)
    params = init_stereo_params(spec)
    stereo = StereoNode(spec, params, device=devs[1])
    frame = np.random.RandomState(0).randint(
        0, 255, (32, 64, 3), np.uint8)
    out = stereo(frame, frame)
    assert out.shape == (32, 64) and np.isfinite(out).all()
    assert devs[1] in stereo._params["encoder2D"]["conv1"][
        "weights"].devices()

    trail = TrailNetNode(device=devs[2]) if _trailnet_available() else None
    if trail is not None:
        probs = trail(np.zeros((180, 320, 3), np.uint8))
        assert probs.shape == (6,)


def _trailnet_available():
    from redtail_tpu.models.trailnet import DEFAULT_PROTOTXT
    return DEFAULT_PROTOTXT.exists()


def test_engine_save_load_roundtrip(tmp_path):
    """Serialized AOT engine (the TRT .plan equivalent,
    `main.cpp:198-276`): save the compiled flagship-family executable,
    load it back, outputs identical to the live-jit path."""
    import jax
    import jax.numpy as jnp

    from redtail_tpu.models import (
        STEREO_SPECS, init_stereo_params, stereo_forward)
    from redtail_tpu.runtime.cache import load_engine, save_engine

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(32, 64), max_disp=4)
    params = init_stereo_params(spec)
    rs = np.random.RandomState(0)
    left = jnp.asarray(rs.rand(1, 32, 64, 3), jnp.float32)
    right = jnp.asarray(rs.rand(1, 32, 64, 3), jnp.float32)
    want = np.asarray(stereo_forward(spec, params, left, right))

    path = tmp_path / "r2d.plan"
    save_engine(path, lambda p, l, r: stereo_forward(spec, p, l, r),
                params, left, right,
                extras={"params": jax.tree.map(np.asarray, params)})
    call, extras = load_engine(path)
    got = np.asarray(call(jax.tree.map(jnp.asarray, extras["params"]),
                          left, right))
    # the AOT loader may pick slightly different host codegen (machine-
    # feature fallback) -> not bitwise; 1e-4 px on a [0,1]-sigmoid map.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_engine_cold_start_no_model_code(tmp_path):
    """A FRESH process loads the engine with the persistent cache
    disabled, runs it, and never imports the model code — no tracing,
    no compilation (load budget: the reference's '<1 s' plan-load,
    README.md:39).

    The engine comes from the PRISTINE-process builder
    (`runtime/engine_builder.py`) — an artifact serialized by a process
    that had already compiled other programs is not portable (XLA:CPU
    AOT function-name suffixing; reproduced if save_engine is called
    here directly after other tests' jits)."""
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from redtail_tpu.models import (
        STEREO_SPECS, init_stereo_params, stereo_forward)
    from redtail_tpu.runtime.engine_builder import build_stereo_engine

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(32, 64), max_disp=4)
    params = init_stereo_params(spec)
    rs = np.random.RandomState(0)
    left = jnp.asarray(rs.rand(1, 32, 64, 3), jnp.float32)
    right = jnp.asarray(rs.rand(1, 32, 64, 3), jnp.float32)
    want = np.asarray(stereo_forward(spec, params, left, right))
    path = tmp_path / "r2d.plan"
    build_stereo_engine(path, spec, params, (1, 32, 64, 3),
                        dtype="fp32", cpu=True)
    np.save(tmp_path / "want.npy", want)
    np.save(tmp_path / "left.npy", np.asarray(left))
    np.save(tmp_path / "right.npy", np.asarray(right))

    script = f"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from redtail_tpu.runtime.cache import load_engine
t0 = time.perf_counter()
call, extras = load_engine({str(path)!r})
load_s = time.perf_counter() - t0
params = jax.tree.map(jnp.asarray, extras["params"])
left = jnp.asarray(np.load({str(tmp_path / 'left.npy')!r}))
right = jnp.asarray(np.load({str(tmp_path / 'right.npy')!r}))
got = np.asarray(call(params, left, right))
want = np.load({str(tmp_path / 'want.npy')!r})
np.testing.assert_allclose(got, want, atol=1e-4)
assert "redtail_tpu.models" not in sys.modules, "model code was imported"
assert load_s < 1.0, f"engine load took {{load_s:.2f}}s (budget 1 s)"
print(f"cold-start ok load={{load_s * 1e3:.1f}}ms")
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=300,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cold-start ok" in r.stdout


def _write_sbs_video(path, n_frames=8, h=32, w=64):
    import cv2
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                         10.0, (2 * w, h))
    assert vw.isOpened()
    rs = np.random.RandomState(0)
    frames = []
    for _ in range(n_frames):
        f = rs.randint(0, 256, (h, 2 * w, 3), np.uint8)
        frames.append(f)
        vw.write(f)
    vw.release()
    return frames


def test_stereo_video_source_sbs(tmp_path):
    """Side-by-side splitter: L/R halves on two topics with ONE shared
    timestamp (the ZED-pair role the reference consumed via
    zed.launch)."""
    from redtail_tpu.runtime.sources import StereoVideoSource

    path = tmp_path / "sbs.avi"
    _write_sbs_video(path)
    g = NodeGraph()
    src = StereoVideoSource(g.topic("camera/left"), g.topic("camera/right"),
                            sbs_path=path, rate_hz=200.0)
    src.start()
    deadline = time.monotonic() + 5.0
    while src.published < 4 and time.monotonic() < deadline:
        time.sleep(0.01)
    src.stop()
    assert src.published >= 4
    ml = g.topic("camera/left").latest()
    mr = g.topic("camera/right").latest()
    assert ml is not None and mr is not None
    assert ml.stamp == mr.stamp  # shared timestamp -> sync always pairs
    assert ml.data.shape == (32, 64, 3) and mr.data.shape == (32, 64, 3)
    assert not np.array_equal(ml.data, mr.data)  # genuinely two halves


def test_stereo_video_source_two_files(tmp_path):
    from redtail_tpu.runtime.sources import StereoVideoSource

    _write_sbs_video(tmp_path / "l.avi", h=32, w=32)
    _write_sbs_video(tmp_path / "r.avi", h=32, w=32)
    g = NodeGraph()
    src = StereoVideoSource(g.topic("l"), g.topic("r"),
                            left_path=tmp_path / "l.avi",
                            right_path=tmp_path / "r.avi", rate_hz=200.0)
    src.start()
    deadline = time.monotonic() + 5.0
    while src.published < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    src.stop()
    assert src.published >= 3
    assert g.topic("l").latest().stamp == g.topic("r").latest().stamp


def test_approx_time_sync_three_way():
    """N-ary ApproximateTime grouping (the viz node's 3-way sync,
    stereo_dnn_ros_viz_node.cpp:202-204)."""
    a, b, c = Topic("a"), Topic("b"), Topic("c")
    sync = ApproxTimeSync(a, b, c, slop=0.05)
    a.publish(1, stamp=10.0)
    b.publish(2, stamp=10.01)
    assert sync.take() is None          # c missing
    c.publish(3, stamp=10.4)
    assert sync.take() is None          # c out of slop
    c.publish(4, stamp=10.02)
    group = sync.take()
    assert [m.data for m in group] == [1, 2, 4]
    assert sync.take() is None          # same group not re-delivered
    a.publish(5, stamp=10.03)
    assert [m.data for m in sync.take()] == [5, 2, 4]


def test_viz_node_writes_mosaics(tmp_path):
    """VizNode: 2x2 mosaic geometry + periodic writes
    (`stereo_dnn_ros_viz_node.cpp:202-219`)."""
    pytest.importorskip("cv2")
    from redtail_tpu.runtime.nodes import VizNode

    viz = VizNode(tmp_path / "viz", every=2)
    rs = np.random.RandomState(0)
    left = rs.randint(0, 256, (20, 30, 3), np.uint8)
    right = rs.randint(0, 256, (20, 30, 3), np.uint8)
    disp = rs.rand(20, 30).astype(np.float32) * 90
    for _ in range(5):
        viz(left, right, disp)
    assert viz.frames == 5 and viz.written == 3  # frames 0, 2, 4
    import cv2
    files = sorted((tmp_path / "viz").glob("mosaic_*.png"))
    assert len(files) == 3
    img = cv2.imread(str(files[0]))
    assert img.shape == (40, 60, 3)  # 2x2 tiles of (20, 30)


def test_nodes_shape_stable_across_camera_sizes():
    """Serving nodes must resize on the HOST so one executable serves
    any camera size: an in-jit resize shape-specializes per input size
    and a codec rounding 257 rows to 256 caused a minutes-long
    mid-flight recompile that starved the live pipeline (r3 thread-dump
    finding)."""
    import dataclasses

    import jax.numpy as jnp

    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode, TrailNetNode

    rs = np.random.RandomState(0)
    if _trailnet_available():
        tn = TrailNetNode()
        for hw in ((120, 160), (256, 513), (180, 320)):
            out = tn(rs.randint(0, 255, (*hw, 3), np.uint8))
            assert out.shape == (6,)
        assert tn._fn._cache_size() == 1, "TrailNet recompiled per size"

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(32, 64), max_disp=4)
    node = StereoNode(spec, init_stereo_params(spec), dtype=jnp.float32)
    for hw in ((32, 64), (31, 64), (40, 80)):
        l = rs.randint(0, 255, (*hw, 3), np.uint8)
        out = node(l, l)
        assert out.shape == (32, 64)
    assert node._fn._cache_size() == 1, "StereoNode recompiled per size"


def test_pipeline_app_rejects_single_sided_video():
    """--video-left without --video-right must fail fast instead of
    silently running synthetic frames (round-3 review finding)."""
    import pytest as _pytest

    from redtail_tpu.apps.pipeline_app import main
    with _pytest.raises(SystemExit, match="together"):
        main(["--video-left", "l.avi", "--duration", "0.1"])


def test_overlapped_stereo_node_shifts_and_stamps():
    """In-loop overlap=N: call k returns frame k-N's result under frame
    k-N's TRUE stamp (`graph.Stamped`), bitwise-equal to the synchronous
    path (VERDICT r4 item 1b)."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.graph import Stamped
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    params = init_stereo_params(spec)
    sync = StereoNode(spec, params)
    node = StereoNode(spec, params, overlap=1)
    assert node.needs_stamp and not sync.needs_stamp

    rs = np.random.RandomState(0)
    frames = [(rs.randint(0, 256, (64, 128, 3), np.uint8),
               rs.randint(0, 256, (64, 128, 3), np.uint8))
              for _ in range(3)]
    want = [sync(l, r) for l, r in frames]

    assert node(*frames[0], stamp=10.0) is None
    out1 = node(*frames[1], stamp=11.0)
    assert isinstance(out1, Stamped) and out1.stamp == 10.0
    np.testing.assert_array_equal(out1.data, want[0])
    out2 = node(*frames[2], stamp=12.0)
    assert out2.stamp == 11.0
    np.testing.assert_array_equal(out2.data, want[1])
    node.drain()
    assert not node._inflight


def test_microbatched_stereo_node_multi_publish():
    """microbatch=2: two frames dispatch as ONE batch-2 executable and
    come back as a list of per-frame `Stamped` results matching the
    synchronous path — the round-trip-amortization serving mode."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    params = init_stereo_params(spec)
    sync = StereoNode(spec, params)
    node = StereoNode(spec, params, overlap=1, microbatch=2)

    rs = np.random.RandomState(1)
    frames = [(rs.randint(0, 256, (64, 128, 3), np.uint8),
               rs.randint(0, 256, (64, 128, 3), np.uint8))
              for _ in range(4)]
    want = [sync(l, r) for l, r in frames]

    assert node(*frames[0], stamp=0.0) is None   # batch filling
    assert node(*frames[1], stamp=1.0) is None   # dispatched, in flight
    assert node(*frames[2], stamp=2.0) is None   # batch filling
    outs = node(*frames[3], stamp=3.0)           # second dispatch pops 1st
    assert isinstance(outs, list) and len(outs) == 2
    assert [o.stamp for o in outs] == [0.0, 1.0]
    np.testing.assert_array_equal(outs[0].data, want[0])
    np.testing.assert_array_equal(outs[1].data, want[1])
    node.drain()


def test_stereo_node_u16_wire_quantization():
    """wire='u16' transports round(disp*64) uint16 and restores float32
    host-side: max |err| <= 1/128 px vs the f32 wire."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    params = init_stereo_params(spec)
    f32 = StereoNode(spec, params)
    u16 = StereoNode(spec, params, wire="u16")

    rs = np.random.RandomState(2)
    l = rs.randint(0, 256, (64, 128, 3), np.uint8)
    r = rs.randint(0, 256, (64, 128, 3), np.uint8)
    a, b = f32(l, r), u16(l, r)
    assert b.dtype == np.float32
    assert np.abs(a - b).max() <= 1.0 / 128.0 + 1e-6


def test_stamped_result_publishes_carried_stamp():
    """Node honours `Stamped` results and forwards stamps to stages
    declaring `needs_stamp` — overlapped stages publish under the TRUE
    source stamp, so camera->output latency cannot be under-reported."""
    from redtail_tpu.runtime.graph import Node, Stamped, Topic

    src, dst = Topic("in"), Topic("out")
    seen = []

    def stage(x, stamp=None):
        seen.append(stamp)
        if len(seen) == 1:
            return None
        return Stamped(x + 1, stamp - 1.0)
    stage.needs_stamp = True

    node = Node("s", stage, [src], dst, max_rate_hz=1000)
    src.publish(1, stamp=100.0)
    assert node.step_once()
    assert dst.latest() is None  # first call returned None -> no publish
    src.publish(2, stamp=200.0)
    assert node.step_once()
    assert seen == [100.0, 200.0]
    assert dst.latest().data == 3
    assert dst.latest().stamp == 199.0  # carried, not the current frame's


def test_pipeline_app_serving_knobs_parse():
    """--overlap/--microbatch/--wire are user-reachable serving knobs
    (not bench-only); microbatch without overlap is rejected at node
    construction."""
    from redtail_tpu.apps.pipeline_app import build_argparser
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    args = build_argparser().parse_args(
        ["--overlap", "2", "--microbatch", "3", "--wire", "u16"])
    assert (args.overlap, args.microbatch, args.wire) == (2, 3, "u16")

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    with pytest.raises(ValueError, match="microbatch requires overlap"):
        StereoNode(spec, init_stereo_params(spec), overlap=0, microbatch=2)


def test_negative_overlap_rejected():
    """overlap < 0 must raise, not silently disable true-stamp
    publishing while still queueing."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    with pytest.raises(ValueError, match="overlap must be >= 0"):
        StereoNode(spec, init_stereo_params(spec), overlap=-1)


def test_plain_list_result_publishes_as_one_message():
    """Only a list of Stamped results is exploded per-frame; a stage
    whose natural payload IS a list publishes it as one message."""
    from redtail_tpu.runtime.graph import Node, Stamped, Topic

    src, dst = Topic("in"), Topic("out")
    node = Node("s", lambda x: [x, x + 1], [src], dst, max_rate_hz=1000)
    src.publish(1, stamp=5.0)
    assert node.step_once()
    assert dst.count == 1
    assert dst.latest().data == [1, 2] and dst.latest().stamp == 5.0

    # ... while a list of Stamped results still explodes per-frame.
    node2 = Node("m", lambda x: [Stamped(x, 1.0), Stamped(x + 1, 2.0)],
                 [src], dst, max_rate_hz=1000)
    src.publish(7, stamp=9.0)
    assert node2.step_once()
    assert dst.count == 3
    assert dst.latest().data == 8 and dst.latest().stamp == 2.0


def test_overlap_warmup_compiles_and_resets():
    """warmup() ticks microbatch*(overlap+1) times (forces both the
    batch-M compile and a blocking fetch) and leaves empty queues."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.runtime.nodes import StereoNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    node = StereoNode(spec, init_stereo_params(spec), overlap=1,
                      microbatch=2)
    dummy = np.zeros((64, 128, 3), np.uint8)
    node.warmup(dummy, dummy)
    assert not node._inflight and not node._batch
    # first post-warmup call starts a fresh pipeline
    assert node(dummy, dummy, stamp=0.0) is None
    node.drain()


def test_topic_history_take_since():
    """history>1 retains a microbatch burst; take_since drains it
    oldest-first; latest-wins take() is unaffected."""
    from redtail_tpu.runtime.graph import Topic

    t = Topic("x", history=3)
    for i in range(5):
        t.publish(i, stamp=float(i))
    assert t.count == 5
    assert t.latest().data == 4
    assert t.take(0).data == 4  # latest-wins unchanged
    got = t.take_since(0)       # ring holds the newest 3
    assert [m.data for m in got] == [2, 3, 4]
    assert [m.seq for m in got] == [3, 4, 5]
    assert t.take_since(4) == [m for m in got if m.seq > 4]
    # growing history preserves retained messages; shrinking is a no-op
    t.set_history(5)
    assert [m.data for m in t.take_since(0)] == [2, 3, 4]
    t.set_history(1)
    assert len(t.take_since(0)) == 3


def test_nodegraph_topic_history_upgrade():
    from redtail_tpu.runtime.graph import NodeGraph

    g = NodeGraph()
    t = g.topic("a")
    g.topic("a", history=4)  # upgrade in place, same object
    assert g.topic("a") is t
    for i in range(4):
        t.publish(i)
    assert len(t.take_since(0)) == 4


@requires_reference
def test_trailnet_overlap_accepts_batch_of_one():
    """The overlapped path must accept the (1, H, W, 3) frames the
    synchronous path accepts (regression: np.stack over 4D frames
    built a 5D batch and the stage errored forever)."""
    from redtail_tpu.models.trailnet import INPUT_HW, load_trailnet
    from redtail_tpu.runtime.nodes import TrailNetNode

    node = TrailNetNode(load_trailnet(seed=1), overlap=1)
    h, w = INPUT_HW
    frame4d = np.zeros((1, h, w, 3), np.uint8)
    assert node(frame4d, stamp=1.0) is None  # priming
    out = node(frame4d, stamp=2.0)
    assert out is not None and out.stamp == 1.0
    assert out.data.shape == (6,)
    node.drain()


@requires_reference
def test_trailnet_device_pins_weights():
    """device= pins the net weights, not just the per-call input
    (stage-per-device pipeline parallelism)."""
    from redtail_tpu.models.trailnet import load_trailnet
    from redtail_tpu.runtime.nodes import TrailNetNode
    import jax

    dev = jax.devices()[2]
    node = TrailNetNode(load_trailnet(seed=1), device=dev)
    blob = next(b for blobs in node.net.params.values()
                for b in blobs if hasattr(b, "devices"))
    assert dev in blob.devices()
    out = node(np.zeros((180, 320, 3), np.uint8))
    assert out.shape == (6,)


@requires_reference
def test_nodes_reject_prebatched_frames():
    """The overlapped serving core matches batch rows to per-call stamps
    by position, so a pre-batched (N>1) per-call input must raise — it
    would otherwise publish frames under the wrong stamps (review
    finding r5). Batching is the node's own job (microbatch=M)."""
    from redtail_tpu.models import STEREO_SPECS, init_stereo_params
    from redtail_tpu.models.trailnet import INPUT_HW, load_trailnet
    from redtail_tpu.runtime.nodes import StereoNode, TrailNetNode

    spec = dataclasses.replace(STEREO_SPECS["resnet18_2d"],
                               input_hw=(64, 128), max_disp=8)
    node = StereoNode(spec, init_stereo_params(spec), overlap=1,
                      microbatch=2)
    two = np.zeros((2, 64, 128, 3), np.uint8)
    with pytest.raises(ValueError, match="one frame pair per call"):
        node(two, two, stamp=0.0)

    h, w = INPUT_HW
    tnode = TrailNetNode(load_trailnet(seed=1), overlap=1)
    with pytest.raises(ValueError, match="one frame per call"):
        tnode(np.zeros((2, h, w, 3), np.uint8), stamp=0.0)


def test_tap_stage_unwraps_and_forwards_needs_stamp():
    """tap_stage must (a) feed on_result the UNWRAPPED data for plain,
    Stamped, and list-of-Stamped results, (b) return the node's output
    untouched for the graph to publish, and (c) forward needs_stamp —
    the hand-rolled wrappers it replaces forgot that attribute, which
    silently re-stamped overlapped results at dispatch time."""
    from redtail_tpu.runtime.graph import Stamped
    from redtail_tpu.runtime.nodes import tap_stage

    class FakeNode:
        needs_stamp = True

        def __init__(self):
            self.calls = []

        def __call__(self, frame, stamp=None):
            self.calls.append(stamp)
            if frame == "none":
                return None
            if frame == "plain":
                return "result"
            if frame == "one":
                return Stamped("r1", 1.0)
            return [Stamped("r2", 2.0), Stamped("r3", 3.0)]

    node = FakeNode()
    seen = []
    stage = tap_stage(node, seen.append)
    assert stage.needs_stamp is True

    assert stage("none", stamp=0.5) is None
    assert seen == [] and node.calls == [0.5]  # stamp reached the node
    assert stage("plain", stamp=0.6) == "result"
    out = stage("one", stamp=0.7)
    assert isinstance(out, Stamped) and out.stamp == 1.0
    outs = stage("burst", stamp=0.8)
    assert [o.stamp for o in outs] == [2.0, 3.0]
    assert seen == ["result", "r1", "r2", "r3"]

    class SyncNode:
        needs_stamp = False

        def __call__(self, frame):  # must NOT be passed a stamp kwarg
            return "sync"

    sync = tap_stage(SyncNode(), seen.append)
    assert sync.needs_stamp is False
    assert sync("f") == "sync"
    assert seen[-1] == "sync"
