"""Typed config (A6), logging (A5), and degraded-mesh policy (A3) tests."""

import logging

import pytest

from tpu_ec.config import Config, configure, get_config, set_config
from tpu_ec.errors import DeviceError
from tpu_ec.utils.log import get_logger, init_logging


@pytest.fixture(autouse=True)
def _restore_config():
    old = get_config()
    yield
    set_config(old)


def test_defaults():
    cfg = Config()
    assert cfg.num_threads == 0
    assert cfg.ntt_leaf_log == 5
    assert cfg.mesh_axis == "shards"
    assert cfg.min_devices == 1
    assert cfg.msm_window is None


def test_from_env(monkeypatch):
    monkeypatch.setenv("TPU_EC_NUM_THREADS", "3")
    monkeypatch.setenv("TPU_EC_TIMER", "1")
    monkeypatch.setenv("TPU_EC_MSM_WINDOW", "9")
    cfg = Config.from_env()
    assert cfg.num_threads == 3
    assert cfg.timer is True
    assert cfg.msm_window == 9


def test_configure_updates_and_rejects_unknown():
    set_config(Config())
    configure(msm_window=7)
    assert get_config().msm_window == 7
    with pytest.raises(AttributeError):
        configure(not_a_field=1)


def test_config_feeds_window_choice():
    """MSM window choice honors the config (SURVEY §5 typed-config item)."""
    set_config(Config(msm_window=4))
    from tpu_ec.curves.params import BN254_G1
    from tpu_ec.curves.point import point_ops
    from tpu_ec.ops.msm import MultiexpKernel

    # smoke: a tiny MSM runs with the configured window
    from tpu_ec.curves import oracle

    spec = BN254_G1
    ops = point_ops(spec)
    # n=32 matches test_msm_scan's canonical shape, so the persistent
    # compile cache dedupes this smoke's program with that suite's
    pts = oracle.random_points(spec, 32, seed=1)
    ks = oracle.random_scalars(spec, 32, seed=2)
    out = MultiexpKernel(spec).multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks)
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


def test_logger_namespace_and_init():
    log = get_logger("tpu_ec.msm")
    assert log.name == "tpu_ec.msm"
    init_logging("DEBUG")
    root = logging.getLogger("tpu_ec")
    assert root.level == logging.DEBUG
    assert any(isinstance(h, logging.StreamHandler) for h in root.handlers)


def test_make_mesh_degrades_to_pow2(caplog):
    import jax

    from tpu_ec.parallel.mesh import make_mesh

    devs = jax.devices()
    want = 2 * len(devs)  # more than available
    with caplog.at_level(logging.WARNING, logger="tpu_ec.parallel"):
        mesh = make_mesh(devs, want=want)
    assert mesh.devices.size == 1 << (len(devs).bit_length() - 1)
    assert any("degrading" in r.message for r in caplog.records)


def test_make_mesh_min_devices_policy():
    import jax

    from tpu_ec.parallel.mesh import make_mesh

    set_config(Config(min_devices=64))
    with pytest.raises(DeviceError):
        make_mesh(jax.devices(), want=128)


def test_make_mesh_no_devices_errors():
    from tpu_ec.parallel.mesh import make_mesh

    with pytest.raises(DeviceError):
        make_mesh([])


def test_make_mesh_probe_keeps_good_devices():
    import jax

    from tpu_ec.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices(), probe=True)
    assert mesh.devices.size == len(jax.devices())


def test_native_load_error_surface():
    from tpu_ec import native

    # on a healthy host the library loads and load_error is None
    assert native.available()
    assert native.load_error() is None
