"""QUALITY --reuse-bf corpus-fingerprint guard (round-4 staleness class).

A bf.mztab is only comparable to the exact corpus it was searched
against; reusing it after the corpus parameters change silently poisons
every downstream ratio.  The guard fingerprints the generated corpus and
refuses a mismatched reuse.
"""

import os

import pytest

from ann_solo_tpu import quality


def _run(workdir, out, n_peptides, extra=()):
    return quality.main([
        "--workdir", str(workdir),
        "--out", str(out),
        "--n-peptides", str(n_peptides),
        "--n-queries", "30",
        "--skip-bf",
        *extra,
    ])


def test_reuse_bf_refuses_changed_corpus(tmp_path):
    workdir = tmp_path / "wd"
    # First run writes the corpus fingerprint (skip-bf keeps it fast;
    # the guard only needs bf.mztab to EXIST, so plant a stub).
    assert _run(workdir, tmp_path / "q1.json", 64) == 0
    fp1 = (workdir / "corpus_fp.txt").read_text().strip()
    assert fp1
    (workdir / "bf.mztab").write_text("MTD\tdummy\n")

    # Same parameters: fingerprint matches, reuse is allowed to proceed
    # past the guard (it will then actually read the stub -- run with
    # skip-bf so the stub is never parsed).
    assert _run(workdir, tmp_path / "q2.json", 64,
                ("--reuse-bf",)) == 0
    assert (workdir / "corpus_fp.txt").read_text().strip() == fp1

    # Different corpus parameters: the guard must refuse.
    with pytest.raises(SystemExit):
        _run(workdir, tmp_path / "q3.json", 96, ("--reuse-bf",))
    # The refusing run must NOT have overwritten the fingerprint.
    assert (workdir / "corpus_fp.txt").read_text().strip() == fp1


def test_corpus_fp_written_on_fresh_run(tmp_path):
    workdir = tmp_path / "wd2"
    assert _run(workdir, tmp_path / "q.json", 64) == 0
    assert os.path.isfile(workdir / "corpus_fp.txt")
