"""core device helpers + timers."""

import time

import jax

from sobfu_tpu import core
from sobfu_tpu.utils.timers import SampledScopeTime, ScopeTime


def test_device_discovery():
    assert core.get_device_count() >= 1
    assert len(core.get_devices()) == core.get_device_count()
    core.print_device_info()  # must not raise


def test_check_accelerator_cpu():
    assert core.check_accelerator() == (jax.default_backend() != "cpu")


def test_profile_trace(tmp_path):
    with core.profile_trace(str(tmp_path / "trace")) as d:
        _ = jax.numpy.sum(jax.numpy.ones((8, 8)))
    assert d


def test_scope_time(capsys):
    with ScopeTime("unit"):
        time.sleep(0.01)
    out = capsys.readouterr().out
    assert "Time(unit)" in out


def test_sampled_scope_time_prints_every_each(capsys):
    t = SampledScopeTime(each=2)
    for _ in range(4):
        with t:
            time.sleep(0.002)
    out = capsys.readouterr().out
    assert out.count("Average frame time") == 2
    assert t.fps > 0
