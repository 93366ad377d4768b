"""Spectral library search engine (reference: ann_solo/spectral_library.py).

TPU-native redesign of the cascade search runtime:

* The library lives on device as dense per-charge peak blocks sorted by
  precursor m/z.  The reference's numexpr precursor-window filter over a
  dense (batch x n_library) boolean matrix (spectral_library.py:417-429)
  becomes two `searchsorted` calls per query -- candidates are a contiguous
  row range, no mask materialization.
* Candidate rescoring runs the batched shifted-dot kernel over fixed-size
  (query, candidate) pair chunks; best match per query via segment-max.
* In 'ann' mode, open-search candidates are additionally filtered to the
  top `num_candidates` neighbors from the TPU IVF index
  (spectral_library.py:431-446).
* Queries with unknown precursor charge are duplicated for charges 2 and 3
  and deduplicated by best score (spectral_library.py:217-223,309-316).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Iterator, List, Optional

import numpy as np

from ann_solo_tpu.config import config
from ann_solo_tpu import fdr
from ann_solo_tpu.io import reader
from ann_solo_tpu.io.store import (
    ChargeBlock,
    SpectralLibraryStore,
    hyperparameter_hash,
    open_or_build_store,
)
from ann_solo_tpu.models.preprocess import (
    PreprocessParams,
    preprocess_batch,
)
from ann_solo_tpu.models.spectrum import (
    Spectrum,
    SpectrumSpectrumMatch,
    pack_spectra,
)
from ann_solo_tpu.utils.profiling import device_trace, profiler

logger = logging.getLogger(__name__)

# Queries per ANN vectorize+select device program (see _ann_candidates:
# one compiled shape per process, whatever batch sizes files produce).
_SELECT_CHUNK = 4096


class _ChargeLibrary:
    """Per-charge library arrays sorted by precursor m/z (device-ready)."""

    def __init__(self, block: ChargeBlock):
        order = np.argsort(block.precursor_mz, kind="stable")
        # Drop library spectra that failed preprocessing quality gates: the
        # reference skips them at candidate-read time
        # (spectral_library.py:452-454).
        order = order[block.proc_is_valid[order]]
        self.rows = block.rows[order]  # global store rows
        self.precursor_mz = block.precursor_mz[order].astype(np.float64)
        self.mz = block.proc_mz[order]
        self.intensity = block.proc_intensity[order]
        self.ann_charge = block.proc_ann_charge[order].astype(np.int32)
        self.n_peaks = block.proc_n_peaks[order]
        self._device = None

    @property
    def n_spectra(self) -> int:
        return len(self.rows)

    def device_arrays(self, mesh=None):
        """Library peak blocks resident on the default device, or
        replicated over `mesh` so dp-sharded rescoring runs SPMD
        (cached either way; the engine passes one mesh for its life)."""
        import jax.numpy as jnp

        if self._device is None:
            arrays = (
                jnp.asarray(self.mz),
                jnp.asarray(self.intensity),
                jnp.asarray(self.ann_charge),
                jnp.asarray(self.precursor_mz, jnp.float32),
            )
            if mesh is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                arrays = jax.device_put(
                    arrays, NamedSharding(mesh, PartitionSpec())
                )
            self._device = arrays
        return self._device


def precursor_window_bounds(
    query_mz: np.ndarray,
    charge: int,
    library_mz_sorted: np.ndarray,
    tol_val: float,
    tol_mode: str,
):
    """Candidate row ranges for a precursor tolerance window.

    Da mode matches the reference's |q - l| * charge <= tol; ppm mode
    |q - l| / l * 1e6 <= tol (spectral_library.py:421-427).  Returns
    (lo, hi) index arrays into the m/z-sorted library.
    """
    query_mz = np.asarray(query_mz, np.float64)
    if tol_mode == "Da":
        delta = tol_val / charge
        lo = np.searchsorted(library_mz_sorted, query_mz - delta, "left")
        hi = np.searchsorted(library_mz_sorted, query_mz + delta, "right")
    elif tol_mode == "ppm":
        # |q - l| <= tol * l / 1e6  <=>  l >= q / (1 + tol/1e6) and
        # l <= q / (1 - tol/1e6).
        scale = tol_val / 10**6
        lo = np.searchsorted(
            library_mz_sorted, query_mz / (1.0 + scale), "left"
        )
        hi = np.searchsorted(
            library_mz_sorted, query_mz / (1.0 - scale), "right"
        )
    else:
        raise ValueError("Unknown precursor tolerance mode")
    return lo.astype(np.int64), hi.astype(np.int64)


def _window_cand_matrix(starts_d, hi_d, width: int):
    """Device-built contiguous candidate rows: starts[:, None] + iota.

    Jitted with a static `width` so each canonical window shape compiles
    once; entries at or past each row's `hi` bound are -1 (invalid).
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def build(starts, hi, w):
        cand = starts[:, None] + jnp.arange(w, dtype=jnp.int32)[None]
        return jnp.where(cand < hi[:, None], cand, -1)

    return build(starts_d, hi_d, width)


class SpectralLibrary:
    """Spectral library search engine
    (reference spectral_library.py:27-500)."""

    def __init__(self, filename: str) -> None:
        self._filename = filename
        self._lib_params = PreprocessParams.from_config(
            config, is_library=True
        )
        self._query_params = PreprocessParams.from_config(
            config, is_library=False
        )
        try:
            self._store: SpectralLibraryStore = open_or_build_store(
                filename, config, self._lib_params
            )
        except FileNotFoundError as e:
            logger.error(e)
            raise
        self._charge_libs: Dict[int, _ChargeLibrary] = {}
        self._ann_indexes: Dict[int, object] = {}
        self._num_candidates = int(config.num_candidates)
        self._mesh = None
        if config.mode == "ann":
            self._mesh = self._make_library_mesh()
            self._prepare_ann_indexes()

    @staticmethod
    def _make_library_mesh():
        """A (dp, lib) device mesh when sharding is requested.

        --num_shards > 1 shards the per-charge IVF lists over that many
        devices; 0 (the default) uses every available device with dp=1;
        on a single-device host the engine stays unsharded.  When
        --num_shards leaves devices over (e.g. 4 shards on a v5e-8), the
        remainder becomes the data-parallel 'dp' axis: query batches
        split across replicas through vectorize -> select -> rescore
        (SURVEY.md §2.3 data-parallel replicas).
        """
        import jax

        n = int(config.num_shards)
        try:
            n_avail = len(jax.devices())
        except RuntimeError:
            return None
        if n == 0:
            n = n_avail
        if n_avail <= 1:
            return None
        if n > n_avail:
            logger.warning(
                "--num_shards %d > %d available devices; not sharding",
                n, n_avail,
            )
            return None
        dp = n_avail // n if n_avail % n == 0 else 1
        from ann_solo_tpu.parallel.mesh import make_mesh

        logger.info(
            "Sharding library over %d devices (dp=%d replicas)", n, dp
        )
        return make_mesh(n * dp, dp_size=dp)

    # ------------------------------------------------------------------ #
    # Library access

    def _get_charge_lib(self, charge: int) -> Optional[_ChargeLibrary]:
        if charge not in self._charge_libs:
            block = self._store.charge_block(charge)
            self._charge_libs[charge] = (
                _ChargeLibrary(block) if block is not None else None
            )
        return self._charge_libs[charge]

    def _prepare_ann_indexes(self) -> None:
        """Build/load per-charge IVF indexes for charges with enough
        spectra (reference spectral_library.py:91-116)."""
        from ann_solo_tpu.index.ivf import IvfIndex, ivf_index_filename

        config_hash = hyperparameter_hash(config)
        # num_list <= 0 = size-aware auto (ivf.resolve_num_list); the
        # ANN index is skipped below the reference's effective floor
        # (spectral_library.py:91-116 only builds for large libraries).
        min_spectra = (
            int(config.num_list) if int(config.num_list) > 0 else 256
        )
        for charge in self._store.charges():
            lib = self._get_charge_lib(charge)
            if lib is None or lib.n_spectra < min_spectra:
                continue
            try:
                index_dtype = str(config.index_dtype)
            except (KeyError, AttributeError):
                index_dtype = "bf16"
            try:
                redundancy = int(config.ivf_redundancy)
            except (KeyError, AttributeError):
                redundancy = 2
            from ann_solo_tpu.index.ivf import resolve_soar_lambda

            filename = ivf_index_filename(
                self._filename, config_hash, charge, index_dtype,
                redundancy, resolve_soar_lambda(config),
            )
            # Tie the persisted index to the store CONTENT it was built
            # from (the file name only encodes the config hash).
            store_fp = getattr(self._store, "source_fingerprint", None)
            index = IvfIndex.load_or_build(
                filename, lib, config, store_fp=store_fp
            )
            if self._mesh is not None:
                if index.num_list % self._mesh.shape["lib"] == 0:
                    from ann_solo_tpu.parallel.sharded_ivf import (
                        ShardedIvfIndex,
                    )

                    index = ShardedIvfIndex(self._mesh, index)
                else:
                    logger.warning(
                        "num_list=%d not divisible by %d library "
                        "shards; charge %d index stays unsharded",
                        index.num_list, self._mesh.shape["lib"], charge,
                    )
            self._ann_indexes[charge] = index

    def shutdown(self) -> None:
        self._charge_libs.clear()
        self._ann_indexes.clear()

    # ------------------------------------------------------------------ #
    # Pipeline warm-up

    def _start_pipeline_warmup(self) -> None:
        """Compile the hot device programs while query I/O runs.

        Same overlap as bench.py's build-time precompile: XLA
        compilation is host/RPC work, so background threads tracing the
        canonical pipeline shapes on zero inputs run concurrently with
        query reading + preprocessing (~tens of seconds for large
        files), and the cascade's first batches find their programs
        already compiled.  Every shape warmed here is one the engine's
        fixed-shape ladders actually use: the `_SELECT_CHUNK` ANN
        vectorize+select programs, the (1024, num_candidates) ANN
        rescore, the two canonical window-rescore widths, and the
        fixed-size best-pair kernel -- per distinct precursor charge
        (`num_shifts` is a static argument).

        Gated to non-CPU backends (a virtual-CPU test mesh would pay
        real compute for the padded warm shapes) and disabled by
        ANN_SOLO_TPU_NO_WARM=1.  Failures only log: a warm miss means
        the first real batch compiles lazily, exactly as before.
        """
        import os
        import threading

        if getattr(self, "_warmup_started", False):
            return
        self._warmup_started = True
        if os.environ.get("ANN_SOLO_TPU_NO_WARM"):
            return
        try:
            import jax

            # The default DEVICE decides where the warm programs run:
            # the axon plugin makes default_backend() report "tpu" even
            # in CPU-pinned test environments (conftest sets
            # jax_default_device to a virtual CPU device), and the warm
            # shapes are far too large for a single-core CPU.
            dev = jax.config.jax_default_device
            if dev is None:
                dev = jax.devices()[0]
            if getattr(dev, "platform", "cpu") != "tpu":
                return
        except Exception:
            return
        import jax.numpy as jnp

        from ann_solo_tpu.models.vectorize import (
            VectorizeParams,
            vectorize_batch,
        )
        from ann_solo_tpu.ops.rescore import rescore_candidate_matrix
        from ann_solo_tpu.ops.shifted_dot_pallas import use_pallas_default

        if self._mesh is not None:
            return  # sharded meshes have their own placement ladders
        vparams = VectorizeParams.from_config(config)
        tables = vparams.device_tables()
        k_peaks = self._query_params.max_peaks_used
        allow_shift = bool(config.allow_peak_shifts)
        frag_tol = float(config.fragment_mz_tolerance)
        use_pallas = use_pallas_default()
        do_open = (
            config.precursor_tolerance_mass_open is not None
            and config.precursor_tolerance_mode_open is not None
        )

        # Gather everything on THIS thread (worker threads only run
        # jitted calls -- no shared-dict mutation off-thread).
        charge_libs = []
        for charge in self._store.charges():
            lib = self._get_charge_lib(charge)
            if lib is None or lib.n_spectra == 0:
                continue
            charge_libs.append(
                (charge, self._lib_device(lib), lib.n_spectra)
            )
        select_targets = []
        if do_open:
            seen_shapes = set()
            for charge, index in self._ann_indexes.items():
                if not hasattr(index, "search_device"):
                    continue
                shape = tuple(np.shape(index.padded_vectors)) + (
                    str(np.asarray(index.padded_ids).dtype),
                )
                if shape in seen_shapes:
                    continue
                seen_shapes.add(shape)
                select_targets.append((charge, index))

        def run(task):
            try:
                task()
            except Exception as e:  # lazy compile covers any miss
                logger.debug("pipeline warmup task failed: %s", e)

        def t_select():
            z_mz = np.zeros((_SELECT_CHUNK, k_peaks), np.float32)
            z_int = np.zeros((_SELECT_CHUNK, k_peaks), np.float32)
            z_n = np.zeros(_SELECT_CHUNK, np.int32)
            vec = vectorize_batch(vparams, tables, z_mz, z_int, z_n)
            for charge, index in select_targets:
                index.search_device(
                    vec, self._num_candidates,
                    q_prec=np.zeros(_SELECT_CHUNK, np.float32),
                    charge=float(charge),
                    tol_val=float(config.precursor_tolerance_mass_open),
                    tol_mode=str(config.precursor_tolerance_mode_open),
                )

        def rescore_task(charge, lib_dev, c_width):
            num_shifts = charge + 1 if allow_shift else 1
            lm, li, la, lp = lib_dev

            def task():
                rescore_candidate_matrix(
                    jnp.zeros((1024, k_peaks), jnp.float32),
                    jnp.zeros((1024, k_peaks), jnp.float32),
                    jnp.zeros((1024,), jnp.float32),
                    lm, li, la, lp,
                    jnp.zeros((1024, c_width), jnp.int32),
                    frag_tol, num_shifts, allow_shift, use_pallas,
                )

            return task

        tasks_by_thread = [[t_select]] if select_targets else [[]]
        ann_tasks, win_tasks = [], []
        for charge, lib_dev, n_spectra in charge_libs:
            if do_open:
                ann_tasks.append(
                    rescore_task(charge, lib_dev, self._num_candidates)
                )
            win_tasks.append(
                rescore_task(charge, lib_dev, self._WIN_NARROW)
            )
            if n_spectra > self._WIN_NARROW:
                # The wide leg always uses sub-rows of exactly
                # _WIN_WIDE, however narrow the actual windows are.
                win_tasks.append(
                    rescore_task(charge, lib_dev, self._WIN_WIDE)
                )
        tasks_by_thread.append(ann_tasks)
        tasks_by_thread.append(win_tasks)
        for tasks in tasks_by_thread:
            if not tasks:
                continue

            def runner(ts=tasks):
                for t in ts:
                    run(t)

            threading.Thread(target=runner, daemon=True).start()

    # ------------------------------------------------------------------ #
    # Search

    def search(self, query_filename: str) -> List[SpectrumSpectrumMatch]:
        """Identify all query spectra
        (reference spectral_library.py:193-260)."""
        logger.info("Process file %s", query_filename)
        profiler.reset()
        self._start_pipeline_warmup()
        with profiler.stage("query I/O + preprocessing"):
            query_spectra = self._read_and_process_queries(query_filename)

        identifications: Dict[str, SpectrumSpectrumMatch] = {}
        do_cascade_open = (
            config.precursor_tolerance_mass_open is not None
            and config.precursor_tolerance_mode_open is not None
        )
        n_identified = 0
        for ssm in self._search_cascade(query_spectra, "std"):
            if not do_cascade_open or ssm.q < config.fdr:
                identifications[ssm.query_identifier] = ssm
                n_identified += ssm.q < config.fdr
        logger.info(
            "%d spectra identified after the standard search", n_identified
        )
        if do_cascade_open:
            for charge in list(query_spectra):
                query_spectra[charge] = [
                    s for s in query_spectra[charge]
                    if s.identifier not in identifications
                ]
            for ssm in self._search_cascade(query_spectra, "open"):
                identifications[ssm.query_identifier] = ssm
                n_identified += ssm.q < config.fdr
            logger.info(
                "%d spectra identified after the open search", n_identified
            )
        profiler.log_summary()
        return list(identifications.values())

    def _read_and_process_queries(
        self, query_filename: str
    ) -> Dict[int, List[Spectrum]]:
        """Read query spectra, expand unknown charges, group by charge."""
        raw: List[Spectrum] = []
        for query_spectrum in reader.read_query_file(query_filename):
            if query_spectrum.precursor_charge is not None:
                raw.append(query_spectrum)
            else:
                for charge in (2, 3):
                    copy = Spectrum(
                        identifier=query_spectrum.identifier,
                        precursor_mz=query_spectrum.precursor_mz,
                        precursor_charge=charge,
                        mz=query_spectrum.mz,
                        intensity=query_spectrum.intensity,
                        retention_time=query_spectrum.retention_time,
                        index=query_spectrum.index,
                    )
                    raw.append(copy)
        query_spectra: Dict[int, List[Spectrum]] = {}
        # Preprocess on device in padded batches; keep valid spectra only.
        batch_size = 8192
        for start in range(0, len(raw), batch_size):
            chunk = raw[start : start + batch_size]
            packed = pack_spectra(chunk, pad_multiple=512)
            processed = preprocess_batch(
                self._query_params, packed.mz, packed.intensity,
                packed.ann_charge, packed.n_peaks, packed.precursor_mz,
                packed.precursor_charge,
            ).to_numpy()
            for i, spectrum in enumerate(chunk):
                if not processed.is_valid[i]:
                    continue
                n = int(processed.n_peaks[i])
                spectrum.mz = processed.mz[i, :n].astype(np.float64)
                spectrum.intensity = processed.intensity[i, :n].astype(
                    np.float64
                )
                spectrum.ann_type = None
                spectrum.ann_index = None
                spectrum.ann_charge = None
                query_spectra.setdefault(
                    spectrum.precursor_charge, []
                ).append(spectrum)
        return query_spectra

    def _search_cascade(
        self, query_spectra: Dict[int, List[Spectrum]], mode: str
    ) -> List[SpectrumSpectrumMatch]:
        """One cascade level (reference spectral_library.py:262-326)."""
        num_spectra = sum(len(q) for q in query_spectra.values())
        if mode == "std":
            logger.debug(
                "Process %d query spectra using a standard search "
                "(Δm = %s %s)", num_spectra,
                config.precursor_tolerance_mass,
                config.precursor_tolerance_mode,
            )
        else:
            logger.debug(
                "Process %d query spectra using an open search "
                "(Δm = %s %s)", num_spectra,
                config.precursor_tolerance_mass_open,
                config.precursor_tolerance_mode_open,
            )
        ssms: Dict[str, SpectrumSpectrumMatch] = {}
        batch_size = int(config.batch_size)
        for charge, spectra in query_spectra.items():
            for start in range(0, len(spectra), batch_size):
                batch = spectra[start : start + batch_size]
                for ssm in self._search_batch(batch, charge, mode):
                    if ssm is None:
                        continue
                    previous = ssms.get(ssm.query_identifier)
                    if (
                        previous is None
                        or ssm.search_engine_score
                        > previous.search_engine_score
                    ):
                        ssms[ssm.query_identifier] = ssm
        logger.info(
            "Filter the spectrum-spectrum matches on FDR (threshold = %s)",
            config.fdr,
        )
        with profiler.stage("rescoring + FDR"):
            return fdr.score_ssms(
                list(ssms.values()),
                config.fdr,
                config.model if config.model != "none" else None,
                mode == "open",
                int(config.fdr_min_group_size),
                config,
            )

    def _search_batch(
        self, batch: List[Spectrum], charge: int, mode: str
    ) -> Iterator[Optional[SpectrumSpectrumMatch]]:
        """Match one charge-homogeneous batch of query spectra
        (reference spectral_library.py:328-455)."""
        lib = self._get_charge_lib(charge)
        if lib is None or lib.n_spectra == 0:
            return
        if mode == "std":
            tol_val = float(config.precursor_tolerance_mass)
            tol_mode = str(config.precursor_tolerance_mode)
        elif mode == "open":
            tol_val = float(config.precursor_tolerance_mass_open)
            tol_mode = str(config.precursor_tolerance_mode_open)
        else:
            raise ValueError("Unknown search mode")

        b = len(batch)
        k = self._query_params.max_peaks_used
        q_mz = np.zeros((b, k), np.float32)
        q_int = np.zeros((b, k), np.float32)
        q_prec = np.zeros(b, np.float64)
        for i, s in enumerate(batch):
            n = min(s.n_peaks, k)
            q_mz[i, :n] = s.mz[:n]
            q_int[i, :n] = s.intensity[:n]
            q_prec[i] = s.precursor_mz

        # First filter: precursor m/z window as sorted-row ranges.
        lo, hi = precursor_window_bounds(
            q_prec, charge, lib.precursor_mz, tol_val, tol_mode
        )

        # Second filter: ANN neighbors (open mode only,
        # spectral_library.py:431-446).  The fused path scores the whole
        # (B, C) candidate matrix on device; the precursor window is
        # already fused into the index scan mask.
        if (
            config.mode == "ann"
            and mode == "open"
            and charge in self._ann_indexes
        ):
            cand_ids = self._ann_candidates(
                batch, q_mz, q_int, lib, charge, tol_val, tol_mode
            )
            with profiler.stage("exact rescoring"), device_trace():
                best_idx, best_score, num_candidates_per_query = (
                    self._rescore_candidate_matrix(
                        q_mz, q_int, q_prec, lib, cand_ids, charge
                    )
                )
        else:
            num_candidates_per_query = (hi - lo).astype(np.int64)
            with profiler.stage("exact rescoring"), device_trace():
                best_idx, best_score = self._rescore_window_ranges(
                    q_mz, q_int, q_prec, lib, lo, hi, charge
                )

        # Recompute peak matches for the best pairs only.
        has_match = best_idx >= 0
        match_rows = np.nonzero(has_match)[0]
        matches_by_row = self._best_pair_matches(
            q_mz, q_int, q_prec, lib, match_rows,
            best_idx[match_rows], charge,
        )
        for i, query in enumerate(batch):
            if not has_match[i]:
                yield None
                continue
            library_spectrum = self._store.get_spectrum(
                int(lib.rows[best_idx[i]]), processed=True
            )
            yield SpectrumSpectrumMatch(
                query,
                library_spectrum,
                peak_matches=matches_by_row[i],
                search_engine_score=float(best_score[i]),
                num_candidates=int(num_candidates_per_query[i]),
            )

    def _lib_device(self, lib):
        """Library peak blocks for rescoring: mesh-replicated when query
        data parallelism is on (dp > 1), default-device otherwise."""
        dp = self._mesh.shape["dp"] if self._mesh is not None else 1
        return lib.device_arrays(self._mesh if dp > 1 else None)

    def _dp_put(self, x, n_trailing: int, dtype=None):
        """Upload `x` sharded over the 'dp' mesh axis (dp > 1), else to
        the default device.  Leading dim must divide dp (callers pad to
        power-of-two buckets)."""
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)
        dp = self._mesh.shape["dp"] if self._mesh is not None else 1
        if dp <= 1:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("dp", *([None] * n_trailing))
        return jax.device_put(x, NamedSharding(self._mesh, spec))

    def _ann_candidates(
        self, batch, q_mz, q_int, lib, charge, tol_val, tol_mode
    ):
        """Top-`num_candidates` ANN neighbors with the precursor window
        fused into the index scan (reference applies it separately,
        spectral_library.py:441-446)."""
        from ann_solo_tpu.models.vectorize import (
            VectorizeParams,
            vectorize_batch,
        )

        vparams = VectorizeParams.from_config(config)
        n_peaks = np.asarray(
            [min(s.n_peaks, q_mz.shape[1]) for s in batch], np.int32
        )
        tables = vparams.device_tables()
        b = q_mz.shape[0]
        dp = self._mesh.shape["dp"] if self._mesh is not None else 1
        if dp > 1:
            # Query data parallelism: the batch splits over the 'dp'
            # mesh axis through vectorize -> select -> rescore.
            import jax
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P

            b_pad = -(-b // dp) * dp
            pad = b_pad - b

            def shard(x, spec):
                x = np.pad(
                    np.asarray(x), [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                )
                return jax.device_put(
                    jnp.asarray(x), NamedSharding(self._mesh, spec)
                )

            tables = jax.device_put(
                tables, NamedSharding(self._mesh, P())
            )
            vectors = vectorize_batch(
                vparams, tables,
                shard(q_mz, P("dp", None)),
                shard(q_int, P("dp", None)),
                shard(n_peaks, P("dp")),
            )[:b]
        else:
            index = self._ann_indexes[charge]
            q_prec_all = np.asarray(
                [s.precursor_mz for s in batch], np.float32
            )
            if b > _SELECT_CHUNK and hasattr(index, "search_device"):
                # Fixed-size select chunks: vectorize + select compile
                # ONE (_SELECT_CHUNK,)-shaped program per process,
                # however many distinct batch sizes the query files and
                # cascade levels produce (a 10k-query cascade used to
                # compile a fresh full-library-scan program for the std
                # pass, ANOTHER for the open pass's survivor batch, and
                # more per extra file -- each ~13 s on this backend).
                # The tail chunk pads with zero queries; compute waste
                # is bounded by one chunk and matches what the old
                # power-of-two tile padding spent anyway.
                import jax.numpy as jnp

                b_pad = -(-b // _SELECT_CHUNK) * _SELECT_CHUNK
                pad = b_pad - b

                def padded(x):
                    return np.pad(
                        x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                    )

                qm, qi = padded(q_mz), padded(q_int)
                npk, qp = padded(n_peaks), padded(q_prec_all)
                out_chunks = []
                for s_ in range(0, b_pad, _SELECT_CHUNK):
                    sl = slice(s_, s_ + _SELECT_CHUNK)
                    vec = vectorize_batch(
                        vparams, tables, qm[sl], qi[sl], npk[sl]
                    )
                    ids, _ = index.search_device(
                        vec, self._num_candidates,
                        q_prec=qp[sl], charge=float(charge),
                        tol_val=float(tol_val), tol_mode=tol_mode,
                    )
                    out_chunks.append(ids)
                return jnp.concatenate(out_chunks)[:b]
            # Small batches pad to a power-of-two bucket so the
            # vectorize program ladder stays bounded too (zero-peak
            # pad queries vectorize to zero rows and are sliced off).
            b_pow2 = 64
            while b_pow2 < b:
                b_pow2 *= 2
            pad = b_pow2 - b
            vectors = vectorize_batch(
                vparams, tables,
                np.pad(q_mz, ((0, pad), (0, 0))),
                np.pad(q_int, ((0, pad), (0, 0))),
                np.pad(n_peaks, (0, pad)),
            )[:b]
        index = self._ann_indexes[charge]
        # One-resident-at-a-time policy for multi-GB indexes (reference:
        # spectral_library.py:457-500): before this charge's blocks
        # upload, evict other charges' device copies so two ~3 GB
        # packed blocks never sit on the chip together.  Queries group
        # by charge, so evictions happen once per charge switch.
        from ann_solo_tpu.index.ivf import _RESIDENT_INDEX_BYTES

        if (
            hasattr(index, "device_block_bytes")
            and index.device_block_bytes() > _RESIDENT_INDEX_BYTES
        ):
            for other_charge, other in self._ann_indexes.items():
                if other_charge != charge and hasattr(
                    other, "release_device"
                ):
                    other.release_device()
        q_prec = np.asarray([s.precursor_mz for s in batch], np.float32)
        if hasattr(index, "search_device"):
            # Device-resident candidates: the rescorer consumes them
            # without the (B, C) matrix ever crossing the tunnel.
            ids, _ = index.search_device(
                vectors, self._num_candidates,
                q_prec=q_prec, charge=float(charge),
                tol_val=float(tol_val), tol_mode=tol_mode,
            )
            return ids
        return index.search(
            vectors, self._num_candidates,
            q_prec=q_prec, charge=float(charge),
            tol_val=float(tol_val), tol_mode=tol_mode,
        )  # (B, C)

    def _rescore_candidate_matrix(
        self, q_mz, q_int, q_prec, lib, cand_ids, charge
    ):
        """Fused device rescoring of a dense (B, C) candidate matrix."""
        import jax.numpy as jnp

        from ann_solo_tpu.ops.rescore import rescore_candidate_matrix
        from ann_solo_tpu.ops.shifted_dot_pallas import use_pallas_default

        allow_shift = bool(config.allow_peak_shifts)
        num_shifts = charge + 1 if allow_shift else 1
        frag_tol = float(config.fragment_mz_tolerance)
        lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d = self._lib_device(lib)
        b = q_mz.shape[0]
        # Queries per device program: bounds gather memory at 1024, and
        # small batches pad up to power-of-two buckets so distinct batch
        # sizes never compile fresh programs.  `cand_ids` may be a device
        # array (the ANN fast path) -- it is sliced/padded with jnp so it
        # never round-trips through the host.
        sub = 64
        while sub < min(b, 1024):
            sub *= 2
        cand_ids = jnp.asarray(cand_ids, jnp.int32)
        outs = []
        for start in range(0, b, sub):
            stop = min(start + sub, b)
            n = stop - start
            sl = slice(start, stop)
            qm, qi = q_mz[sl], q_int[sl]
            qp, ci = q_prec[sl], cand_ids[sl]
            if n < sub:  # pad the tail to the compiled shape
                pad = sub - n
                qm = np.concatenate([qm, np.zeros((pad,) + qm.shape[1:],
                                                  qm.dtype)])
                qi = np.concatenate([qi, np.zeros((pad,) + qi.shape[1:],
                                                  qi.dtype)])
                qp = np.concatenate([qp, np.zeros(pad, qp.dtype)])
                ci = jnp.pad(ci, ((0, pad), (0, 0)), constant_values=-1)
            out = rescore_candidate_matrix(
                self._dp_put(qm, 1), self._dp_put(qi, 1),
                self._dp_put(qp.astype(np.float32), 0),
                lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d,
                self._dp_put(ci, 1, dtype=jnp.int32),
                frag_tol, num_shifts, allow_shift,
                use_pallas_default(),
            )
            outs.append(tuple(np.asarray(o)[:n] for o in out))
        best_idx = np.concatenate([o[0] for o in outs])
        best_score = np.concatenate([o[1] for o in outs])
        n_cands = np.concatenate([o[2] for o in outs])
        return best_idx.astype(np.int64), best_score, n_cands

    # Canonical window-rescore shapes.  Every window-mode rescore call
    # uses ONE of exactly two (rows, width) device shapes: narrow
    # windows (std-search ppm tolerances) pack whole per-query ranges,
    # wide windows (open-search Da ranges) split into fixed-width
    # sub-rows whose per-sub-row winners reduce on the host.  Two shapes
    # = two compiled program ladders per process, however many files,
    # batch sizes, or window widths a run sees -- the (group, width)
    # bucket ladder this replaces could cost minutes of tunnel compiles
    # on a fresh process (the per-raw-file fan-out tax, VERDICT r2 #6).
    _WIN_ROWS = 1024  # rows per device call
    _WIN_NARROW = 256  # widths <= this pack as-is
    _WIN_WIDE = 16384  # wider windows split into sub-rows of this

    def _rescore_window_ranges(
        self, q_mz, q_int, q_prec, lib, lo, hi, charge
    ):
        """Exact rescoring of contiguous precursor-window row ranges.

        Each query's [lo, hi) range becomes one narrow sub-row or
        several wide sub-rows (canonical shapes above); all sub-rows run
        through the same two-stage certificate rescorer as the ANN path,
        and a query's winner is the score-max over its sub-rows (ties
        resolve to the earliest sub-row, preserving the
        first-in-matrix-order tie rule of the unsplit formulation).
        """
        from ann_solo_tpu.ops.rescore import rescore_candidate_matrix
        from ann_solo_tpu.ops.shifted_dot_pallas import use_pallas_default

        b = q_mz.shape[0]
        allow_shift = bool(config.allow_peak_shifts)
        num_shifts = charge + 1 if allow_shift else 1
        frag_tol = float(config.fragment_mz_tolerance)
        lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d = self._lib_device(lib)
        use_pallas = use_pallas_default()
        best_idx = np.full(b, -1, np.int64)
        best_score = np.full(b, -np.inf, np.float64)
        lo = lo.astype(np.int64)
        hi = hi.astype(np.int64)
        widths = hi - lo

        # Expand to (source query, sub-range start, canonical width).
        narrow_q = np.nonzero((widths > 0) & (widths <= self._WIN_NARROW))[0]
        wide_rows = np.nonzero(widths > self._WIN_NARROW)[0]
        n_sub = -(-widths[wide_rows] // self._WIN_WIDE)
        wide_q = np.repeat(wide_rows, n_sub)
        # Sub-range starts: lo, lo + W, ... per wide query, in order.
        offs = (
            np.arange(len(wide_q))
            - np.repeat(np.cumsum(n_sub) - n_sub, n_sub)
        ) * self._WIN_WIDE
        wide_lo = lo[wide_q] + offs

        def run(sub_q, sub_lo, width):
            import jax.numpy as jnp

            # Row count buckets to the work size (power of two, <=
            # _WIN_ROWS): small files/tests don't pad 60 rows up to 1024
            # (wasted compute AND a needless big compile), while big
            # batches always use the one full-size shape.  <= 5 row
            # buckets x 2 widths bounds the per-process program count.
            g = 64
            while g < min(len(sub_q), self._WIN_ROWS):
                g *= 2
            for s in range(0, len(sub_q), g):
                rows = sub_q[s : s + g]
                starts = sub_lo[s : s + g]
                n_rows = len(rows)
                if n_rows < g:  # pad to the compiled shape
                    pad = g - n_rows
                    rows = np.concatenate([rows, np.full(pad, rows[0])])
                    starts = np.concatenate(
                        [starts, np.full(pad, sub_lo[s])]
                    )
                # The (g, width) candidate matrix is built ON DEVICE
                # from the (g,) starts/bounds: uploading it from the
                # host cost ~4 bytes/pair over the tunnel and capped the
                # whole bf window leg at 1.3M pairs/s (the rescore
                # machinery itself runs at ~8.5M pairs/s at this shape,
                # tools/bf_profile.py round 4).
                starts_d = self._dp_put(starts.astype(np.int32), 0)
                hi_d = self._dp_put(hi[rows].astype(np.int32), 0)
                cand = _window_cand_matrix(starts_d, hi_d, width)
                idx_g, score_g, _ = rescore_candidate_matrix(
                    self._dp_put(q_mz[rows], 1),
                    self._dp_put(q_int[rows], 1),
                    self._dp_put(q_prec[rows].astype(np.float32), 0),
                    lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d,
                    cand,
                    frag_tol, num_shifts, allow_shift, use_pallas,
                )
                # Earliest-sub-row max: sub-rows arrive in range order,
                # so a strict > keeps the first maximal sub-row.
                for j in range(n_rows):
                    q = rows[j]
                    if score_g[j] > best_score[q]:
                        best_score[q] = score_g[j]
                        best_idx[q] = idx_g[j]

        if len(narrow_q):
            run(narrow_q, lo[narrow_q], self._WIN_NARROW)
        if len(wide_q):
            run(wide_q, wide_lo, self._WIN_WIDE)
        return best_idx, best_score

    def _best_pair_matches(
        self, q_mz, q_int, q_prec, lib, rows, cand_idx, charge
    ):
        """Peak matches for the best (query, candidate) pairs.

        Runs the Pallas kernel's in-kernel match extraction on TPU
        (SpectrumMatch.cpp full return contract); XLA greedy elsewhere.
        """
        from ann_solo_tpu.ops.shifted_dot_pallas import (
            PAIR_BLOCK,
            shifted_dot_best_match_auto,
            use_pallas_default,
        )

        matches_by_row: Dict[int, np.ndarray] = {}
        allow_shift = bool(config.allow_peak_shifts)
        num_shifts = charge + 1 if allow_shift else 1
        frag_tol = float(config.fragment_mz_tolerance)
        chunk = 4096
        for start in range(0, len(rows), chunk):
            r = rows[start : start + chunk]
            c = cand_idx[start : start + chunk]
            n = len(r)
            # Arbitrary PAIR_BLOCK multiples compile a fresh Pallas
            # kernel per distinct batch size -- profiled at ~6 s PER
            # SIZE on the tunneled backend, which made this cheap stage
            # 34% of a brute-force cascade (tools/bf_profile.py).  On
            # the Pallas path pad to the one fixed `chunk` size (one
            # compile per process; scoring <= 4096 padded pairs costs
            # ~1 ms at the kernel's ~4M pairs/s).  The XLA fallback's
            # cost scales with the padded size, so it buckets to a
            # power of two instead.
            if use_pallas_default():
                g = chunk
            else:
                g = PAIR_BLOCK
                while g < n:
                    g *= 2
            if n < g:
                pad = g - n
                r = np.concatenate([r, np.full(pad, r[0])])
                c = np.concatenate([c, np.full(pad, c[0])])
            charges = np.full(len(r), charge, np.int32)
            _, match_q, match_c = shifted_dot_best_match_auto(
                q_mz[r], q_int[r],
                lib.mz[c], lib.intensity[c], lib.ann_charge[c],
                q_prec[r].astype(np.float32),
                lib.precursor_mz[c].astype(np.float32),
                charges, frag_tol, num_shifts, allow_shift,
            )
            match_q = np.asarray(match_q)[:n]
            match_c = np.asarray(match_c)[:n]
            for j, row in enumerate(r[:n]):
                sel = match_q[j] >= 0
                matches_by_row[int(row)] = np.column_stack(
                    [match_q[j][sel], match_c[j][sel]]
                )
        return matches_by_row
