"""Native C++ MGF parser vs the pure-Python reader (parity oracle)."""

import numpy as np
import pytest

from ann_solo_tpu.io import mgf_native
from ann_solo_tpu.io.mgf import read_mgf, read_mgf_python, write_mgf

from synth import make_library, noisy_query

pytestmark = pytest.mark.skipif(
    not mgf_native.available(), reason="native toolchain unavailable"
)


def _edge_case_mgf(path):
    path.write_text(
        "# leading comment outside blocks\n"
        "BEGIN IONS\n"
        "TITLE=spectrum one\n"
        "PEPMASS=512.25 1000.0\n"
        "CHARGE=2+\n"
        "RTINSECONDS=73.5\n"
        "100.5 10.0\n"
        "200.25 20.5 extra ignored\n"
        "END IONS\n"
        "\n"
        "BEGIN IONS\n"
        "SCAN=42\n"
        "PEPMASS=800.125\n"
        "CHARGE=3-\n"
        "SEQ=+42.011AC+57.021DEK\n"
        "DECOY=1\n"
        "150.0\t1.5\n"
        "END IONS\n"
        "BEGIN IONS\n"
        "PEPMASS=300.0\n"
        "305.1 3.0\n"
        "310.2 4.0\n"
        "END IONS\n"
    )
    return str(path)


def _compare(filename):
    native = list(mgf_native.read_mgf_native(filename))
    python = list(read_mgf_python(filename))
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a.identifier == b.identifier
        assert a.precursor_charge == b.precursor_charge
        assert a.is_decoy == b.is_decoy
        assert a.peptide == b.peptide
        assert (a.retention_time is None) == (b.retention_time is None)
        if a.retention_time is not None:
            assert a.retention_time == pytest.approx(b.retention_time)
        assert a.precursor_mz == pytest.approx(b.precursor_mz, abs=1e-12)
        np.testing.assert_array_equal(a.mz, b.mz)
        np.testing.assert_array_equal(a.intensity, b.intensity)


def test_edge_cases_match_python(tmp_path):
    filename = _edge_case_mgf(tmp_path / "edge.mgf")
    _compare(filename)
    native = list(mgf_native.read_mgf_native(filename))
    assert native[0].identifier == "spectrum one"
    assert native[0].precursor_charge == 2
    assert native[1].identifier == "42"  # SCAN fallback
    assert native[1].precursor_charge == -3
    assert native[1].is_decoy
    assert native[1].peptide is not None  # SEQ converted to ProForma
    assert native[2].identifier == "3"  # index fallback
    assert native[2].precursor_charge is None
    assert native[2].retention_time is None


def test_synthetic_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(71)
    _, spectra = make_library(rng, n_peptides=25)
    queries = [noisy_query(s, rng, f"q{i}") for i, s in enumerate(spectra)]
    filename = str(tmp_path / "lib.mgf")
    write_mgf(spectra + queries, filename)
    _compare(filename)


def test_read_mgf_dispatches_to_native(tmp_path):
    filename = _edge_case_mgf(tmp_path / "edge2.mgf")
    assert len(list(read_mgf(filename))) == 3


def test_empty_file(tmp_path):
    path = tmp_path / "empty.mgf"
    path.write_text("")
    assert list(mgf_native.read_mgf_native(str(path))) == []


def test_malformed_spectra_skipped_with_warning(tmp_path):
    """Bad PEPMASS values skip the spectrum (reference reader.py:683-687
    behavior), identically in both readers."""
    path = tmp_path / "bad.mgf"
    path.write_text(
        "BEGIN IONS\nTITLE=ok\nPEPMASS=500.0\n100.0 1.0\nEND IONS\n"
        "BEGIN IONS\nTITLE=bad\nPEPMASS=oops\n100.0 1.0\nEND IONS\n"
        "BEGIN IONS\nTITLE=missing\n100.0 1.0\nEND IONS\n"
    )
    native = list(mgf_native.read_mgf_native(str(path)))
    python = list(read_mgf_python(str(path)))
    assert [s.identifier for s in native] == ["ok"]
    assert [s.identifier for s in python] == ["ok"]


def test_reader_parity_on_garbage_lines(tmp_path):
    """Bad peak lines and unparsable CHARGE values must behave the same
    in both readers: line skipped / charge left unknown, spectrum kept."""
    path = tmp_path / "garbage.mgf"
    path.write_text(
        "BEGIN IONS\n"
        "TITLE=messy\n"
        "PEPMASS=500.0\n"
        "CHARGE=two\n"
        "100.0 1.0\n"
        "123abc 456\n"   # digit-leading garbage line
        "1,5 100\n"      # wrong decimal separator
        "200.0 2.0\n"
        "END IONS\n"
        "BEGIN IONS\n"
        "TITLE=suffixed charge\n"
        "PEPMASS=600.0\n"
        "CHARGE=2x\n"
        "150.0 1.5\n"
        "END IONS\n"
    )
    _compare(str(path))
    native = list(mgf_native.read_mgf_native(str(path)))
    assert native[0].precursor_charge is None
    np.testing.assert_array_equal(native[0].mz, [100.0, 200.0])
    assert native[1].precursor_charge is None


def test_nested_begin_ions_discards_dangling_block(tmp_path):
    """A repeated BEGIN IONS without END IONS drops the partial block in
    both readers without desynchronizing the native columnar arrays."""
    path = tmp_path / "nested.mgf"
    path.write_text(
        "BEGIN IONS\n"
        "TITLE=dangling\n"
        "PEPMASS=500.0\n"
        "100.0 1.0\n"
        "BEGIN IONS\n"          # no END IONS for the previous block
        "TITLE=complete\n"
        "PEPMASS=600.0\n"
        "200.0 2.0\n"
        "END IONS\n"
    )
    _compare(str(path))
    native = list(mgf_native.read_mgf_native(str(path)))
    assert [s.identifier for s in native] == ["complete"]
    assert native[0].precursor_mz == pytest.approx(600.0)
    np.testing.assert_array_equal(native[0].mz, [200.0])


def test_truncated_final_block_dropped(tmp_path):
    """A file cut off mid-spectrum must drop the unterminated block (the
    Python reader's behavior), not corrupt the columnar offsets."""
    path = tmp_path / "trunc.mgf"
    path.write_text(
        "BEGIN IONS\n"
        "TITLE=complete\n"
        "PEPMASS=500.0\n"
        "100.0 1.0\n"
        "200.0 2.0\n"
        "END IONS\n"
        "BEGIN IONS\n"
        "TITLE=cut off mid-peaks\n"
        "PEPMASS=600.0\n"
        "150.0 1.5\n"
    )
    native = list(mgf_native.read_mgf_native(str(path)))
    python = list(read_mgf_python(str(path)))
    assert len(native) == len(python) == 1
    assert native[0].identifier == "complete"
    np.testing.assert_array_equal(native[0].mz, [100.0, 200.0])
