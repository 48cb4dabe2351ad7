"""Physics-suite resolution (ref: mpas_atmphys_control.F:120-160 —
'suite' sentinels resolve per config_physics_suite; explicit settings
win; unknown suites are fatal)."""

import dataclasses

import pytest

from mpas_tpu.cores.atmosphere.physics.manager import (PhysicsConfig,
                                                       resolve_suite)


def test_mesoscale_reference_defaults():
    cfg = PhysicsConfig(config_physics_suite="mesoscale_reference",
                        config_microp_scheme="suite",
                        config_conv_scheme="suite",
                        config_pbl_scheme="suite",
                        config_gwdo_scheme="suite",
                        config_radiation_scheme="suite",
                        config_cldfra_scheme="suite",
                        config_sfclay_scheme="suite",
                        config_lsm_scheme="suite")
    r = resolve_suite(cfg)
    assert r.config_microp_scheme == "wsm6"
    assert r.config_conv_scheme == "tiedtke"      # the cu_ntiedtke branch
    assert r.config_pbl_scheme == "ysu"
    assert r.config_radiation_scheme == "kdist"   # RRTMG-class
    assert r.config_lsm_scheme == "noah"


def test_convection_permitting_defaults():
    cfg = PhysicsConfig(config_physics_suite="convection_permitting",
                        config_microp_scheme="suite",
                        config_conv_scheme="suite",
                        config_pbl_scheme="suite",
                        config_sfclay_scheme="suite")
    r = resolve_suite(cfg)
    assert r.config_microp_scheme == "thompson"
    assert r.config_conv_scheme == "grell_freitas"
    assert r.config_pbl_scheme == "mynn"
    assert r.config_sfclay_scheme == "mynn"


def test_explicit_settings_win_over_suite():
    cfg = PhysicsConfig(config_physics_suite="mesoscale_reference",
                        config_microp_scheme="thompson",
                        config_conv_scheme="suite")
    r = resolve_suite(cfg)
    assert r.config_microp_scheme == "thompson"   # explicit wins
    assert r.config_conv_scheme == "tiedtke"


def test_none_suite_turns_everything_off():
    cfg = PhysicsConfig(config_physics_suite="none",
                        config_microp_scheme="suite",
                        config_pbl_scheme="suite")
    r = resolve_suite(cfg)
    assert r.config_microp_scheme == "off"
    assert r.config_pbl_scheme == "off"


def test_unknown_suite_is_fatal():
    cfg = PhysicsConfig(config_physics_suite="cloud_resolving_2099")
    with pytest.raises(ValueError, match="Unrecognized"):
        resolve_suite(cfg)


def test_resolved_config_is_idempotent():
    cfg = PhysicsConfig(config_physics_suite="mesoscale_reference",
                        config_microp_scheme="suite")
    r1 = resolve_suite(cfg)
    r2 = resolve_suite(r1)
    assert dataclasses.asdict(r1) == dataclasses.asdict(r2)
