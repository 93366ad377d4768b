"""Multi-file query fan-out: one engine instance, one mzTab per file.

The reference ran one process per raw file (4,207 invocations for
Kim2014); here a query glob is searched by a single engine, amortizing
library load, index residency, and device-program compilation.
"""

import numpy as np
import pytest

from ann_solo_tpu.io.mgf import write_mgf
from ann_solo_tpu.io.mztab import read_mztab_metadata, read_mztab_ssms
from ann_solo_tpu.io.splib import write_splib

from synth import make_library, noisy_query


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multifile")
    rng = np.random.default_rng(83)
    peptides, spectra = make_library(rng, n_peptides=40)
    lib_path = str(tmp / "lib.splib")
    write_splib(spectra, lib_path)
    for part in range(2):
        queries = [
            noisy_query(s, rng, f"p{part}_q{i}")
            for i, s in enumerate(spectra[part * 15 : part * 15 + 15])
        ]
        write_mgf(queries, str(tmp / f"run{part}.mgf"))
    return tmp, lib_path, peptides


def _args(lib_path, query, out):
    return [
        lib_path, query, out,
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--min_mz_range", "200",
        "--min_peaks", "5",
        "--model", "none",
        "--mode", "bf",
        "--fdr", "0.05",
        "--add_decoys",
    ]


def test_query_glob_writes_one_mztab_per_file(setup):
    from ann_solo_tpu.cli import main

    tmp, lib_path, peptides = setup
    out_dir = tmp / "outs"
    out_dir.mkdir()
    assert main(_args(lib_path, str(tmp / "run*.mgf"),
                      str(out_dir))) == 0
    outs = sorted(out_dir.glob("*.mztab"))
    assert [o.name for o in outs] == ["run0.mztab", "run1.mztab"]
    for part, out in enumerate(outs):
        ssms = read_mztab_ssms(str(out))
        assert len(ssms) == 15
        assert all(str(i).startswith(f"p{part}_") for i in ssms.index)
        # Metadata records the per-file query, not the glob.
        meta = open(str(out)).read()
        assert f"run{part}.mgf" in meta


def test_glob_with_bad_out_template_errors(setup):
    from ann_solo_tpu.cli import main

    tmp, lib_path, _ = setup
    with pytest.raises(ValueError, match="placeholder"):
        main(_args(lib_path, str(tmp / "run*.mgf"),
                   str(tmp / "single.mztab")))


def test_single_match_glob_still_uses_directory(setup):
    """A glob matching ONE file must still write into the requested
    output directory, not a sibling '<dir>.mztab' file."""
    from ann_solo_tpu.cli import main

    tmp, lib_path, _ = setup
    out_dir = tmp / "single_glob"
    out_dir.mkdir()
    assert main(_args(lib_path, str(tmp / "run0*.mgf"),
                      str(out_dir))) == 0
    assert (out_dir / "run0.mztab").exists()
    assert not (tmp / "single_glob.mztab").exists()


def test_colliding_basenames_rejected(setup, tmp_path):
    """Two matched query files with the same basename would overwrite
    each other's mzTab; the CLI must reject the mapping up front."""
    import shutil

    from ann_solo_tpu.cli import main

    tmp, lib_path, _ = setup
    out_dir = tmp_path / "outs"
    out_dir.mkdir()
    both = tmp_path / "both"
    (both / "x").mkdir(parents=True)
    (both / "y").mkdir()
    shutil.copy(str(tmp / "run0.mgf"), str(both / "x" / "run0.mgf"))
    shutil.copy(str(tmp / "run0.mgf"), str(both / "y" / "run0.mgf"))
    with pytest.raises(ValueError, match="colliding"):
        main(_args(lib_path, str(both / "*" / "run0.mgf"),
                   str(out_dir)))


def test_out_template_placeholder(setup):
    from ann_solo_tpu.cli import main

    tmp, lib_path, _ = setup
    assert main(_args(lib_path, str(tmp / "run*.mgf"),
                      str(tmp / "tpl_{}.mztab"))) == 0
    assert (tmp / "tpl_run0.mztab").exists()
    assert (tmp / "tpl_run1.mztab").exists()
