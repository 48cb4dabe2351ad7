"""Native registry compiler: schema extraction from real reference
registries (ref: src/tools/registry + input_gen capability, SURVEY §2.2)."""

import os

import pytest

from mpas_tpu.framework.registry import (ensure_built,
                                         generate_config_class,
                                         generate_default_namelist,
                                         load_schema)

REF = "/root/reference/src"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestRegistryCompiler:
    def test_builds(self):
        assert os.path.exists(ensure_built())

    def test_sw_config_matches_handwritten(self):
        Config = generate_config_class(f"{REF}/core_sw/Registry.xml")
        from mpas_tpu.cores.sw.config import SWConfig
        gen = Config()
        hand = SWConfig()
        for f in ("config_test_case", "config_dt", "config_apvm_upwinding",
                  "config_monotonic", "config_thickness_adv_order",
                  "config_time_integration", "config_num_halos"):
            assert getattr(gen, f) == getattr(hand, f), f

    def test_atmosphere_schema(self):
        s = load_schema(f"{REF}/core_atmosphere/Registry.xml")
        assert s["core"] == "atmosphere"
        names = {v["name"] for v in s["var_structs"]["state"]["vars"]}
        assert {"u", "w", "theta_m", "rho_zz", "scalars"} <= names
        assert s["var_structs"]["state"]["time_levs"] == 2
        assert "nVertLevels" in s["dims"]

    def test_default_namelist_roundtrip(self, tmp_path):
        nml = generate_default_namelist(f"{REF}/core_sw/Registry.xml")
        p = tmp_path / "namelist.sw"
        p.write_text(nml)
        from mpas_tpu.framework.namelist import from_namelist_file
        from mpas_tpu.cores.sw.config import SWConfig
        cfg = from_namelist_file(SWConfig, str(p))
        assert cfg.config_dt == 172.8
        assert cfg.config_test_case == 5
