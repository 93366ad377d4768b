"""Config system tests: precedence CLI > config.ini > defaults."""

import os

import pytest

from ann_solo_tpu.config import Config


BASE = ["lib.splib", "q.mgf", "out.mztab",
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02"]


def test_defaults():
    config = Config()
    config.parse(BASE)
    assert config.min_mz == 11
    assert config.max_mz == 2010
    assert config.bin_size == 0.04
    assert config.hash_len == 800
    assert config.num_list == 0  # 0 = size-aware auto (resolve_num_list)
    # 0 = size-aware auto (resolve_num_probe: num_list/8 in [512, 2048]).
    # Reproduces the round-5 probe-ladder winner p=512 at the canonical
    # scale (ann/bf 0.9949, QUALITY_r05_p512.json) and scales the depth
    # with the library (QUALITY_r05_2m_* measured fixed depths stale
    # at 2.1M rows).
    assert config.num_probe == 0
    # int8 shipped after QUALITY_r04_int8 measured IDs/accuracy/recall
    # identical to bf16 at 1/4 the scan traffic.
    assert config.index_dtype == "int8"
    # 512 shipped after the r05 QUALITY ladder measured 256/512/1024
    # candidates IDs-identical at 1% FDR (QUALITY_r05_c512.json).
    assert config.num_candidates == 512
    assert config.batch_size == 16384
    assert config.scaling == "rank"
    assert config.model == "rf"
    assert config.mode == "ann"
    assert not config.allow_peak_shifts
    assert config.precursor_tolerance_mass == 20.0
    assert config["fragment_mz_tolerance"] == 0.02


def test_cli_overrides():
    config = Config()
    config.parse(BASE + ["--hash_len", "400", "--allow_peak_shifts",
                         "--model", "none"])
    assert config.hash_len == 400
    assert config.allow_peak_shifts
    assert config.model == "none"


def test_config_file(tmp_path):
    ini = tmp_path / "my.ini"
    ini.write_text(
        "precursor_tolerance_mass = 10\n"
        "precursor_tolerance_mode = Da\n"
        "fragment_mz_tolerance = 0.05\n"
        "hash_len = 1600\n"
        "allow_peak_shifts = true\n"
    )
    config = Config()
    # Required args satisfied by the config file; CLI overrides hash_len.
    config.parse(
        ["-c", str(ini), "lib.splib", "q.mgf", "out.mztab",
         "--hash_len", "800"]
    )
    assert config.precursor_tolerance_mass == 10.0
    assert config.precursor_tolerance_mode == "Da"
    assert config.fragment_mz_tolerance == 0.05
    assert config.hash_len == 800  # CLI wins
    assert config.allow_peak_shifts is True


def test_uninitialized_raises():
    config = Config()
    with pytest.raises(RuntimeError):
        _ = config.min_mz


def test_required_args():
    config = Config()
    with pytest.raises(SystemExit):
        config.parse(["lib.splib", "q.mgf", "out.mztab"])
