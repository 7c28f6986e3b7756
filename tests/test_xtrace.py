"""Device-trace attribution (jello_tpu/xtrace.py + Profiler.collect):
parses a synthetic XSpace capture the way real TPU captures are shaped
(one TPU plane, an "XLA Ops" line whose events carry tf_op/source
stats), so the per-stage device-timing path of the profiler is
exercised in the fast suite without a chip."""

import os

import pytest

pb = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from jello_tpu.profiler import Profiler, ProfilerResult, device_stage_results
from jello_tpu.xtrace import attribute, stage_times, union_ms


def _write_capture(tmp_path):
    xs = pb.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"

    # stat metadata: 1 = tf_op, 2 = source
    sm = plane.stat_metadata
    sm[1].id = 1
    sm[1].name = "tf_op"
    sm[2].id = 2
    sm[2].name = "source"

    def add_op(mid, name, tf_op, source):
        em = plane.event_metadata[mid]
        em.id = mid
        em.name = name
        st = em.stats.add()
        st.metadata_id = 1
        st.str_value = tf_op
        st = em.stats.add()
        st.metadata_id = 2
        st.str_value = source

    add_op(1, "%fusion.1 = f32[8] fusion(...)",
           "jit(render)/flatten/add", "pipeline/flatten.py:100")
    add_op(2, "%custom-call.1 = f32[8] custom-call(...)",
           "jit(render)/fine/fine_v2", "tpu/fine_v2.py:50")

    line = plane.lines.add()
    line.name = "XLA Ops"
    # flatten: 2 events x 3 ms; fine: 1 event x 4 ms (ps units).
    for off, dur, mid in ((0, 3e9, 1), (4e9, 3e9, 1), (8e9, 4e9, 2)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.offset_ps = int(off)
        ev.duration_ps = int(dur)

    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d, exist_ok=True)
    with open(d / "host.xplane.pb", "wb") as f:
        f.write(xs.SerializeToString())
    return str(tmp_path)


def test_union_ms_overlap():
    assert union_ms([(0, 2e9), (1e9, 3e9), (5e9, 6e9)]) == pytest.approx(4.0)


def test_attribute_and_stage_times(tmp_path):
    logdir = _write_capture(tmp_path)
    st = stage_times(logdir, frames=2)
    assert st["flatten"] == pytest.approx(3.0)  # 6 ms over 2 frames
    assert st["fine"] == pytest.approx(2.0)
    tabs = attribute(logdir, frames=2)
    t = tabs["/device:TPU:0"]
    assert t["kinds"]["fusion"][0] == pytest.approx(3.0)
    assert t["kinds"]["custom-call"][0] == pytest.approx(2.0)
    assert t["sources"]["pipeline/flatten.py:100"][0] == pytest.approx(3.0)
    # ops sorted by descending per-frame ms
    assert t["ops"][0][2] >= t["ops"][-1][2]


def test_profiler_collect_includes_device_stages(tmp_path):
    logdir = _write_capture(tmp_path)
    results = device_stage_results(logdir, frames=2)
    assert len(results) == 1
    dev = results[0]
    assert dev.label == "device:/device:TPU:0"
    by_label = {c.label: c for c in dev.children}
    assert by_label["flatten"].duration == pytest.approx(3.0e-3)
    assert by_label["fine"].duration == pytest.approx(2.0e-3)
    # collect() drains device results alongside host spans
    p = Profiler()
    p._device_results += results
    with p.start("frame"):
        pass
    got = p.collect()
    labels = [r.label for r in got]
    assert "frame" in labels and dev.label in labels
    assert isinstance(got[0], ProfilerResult)
    assert p.collect() == []
