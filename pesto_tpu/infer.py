"""Inference engine: bucketed, jitted, batched prediction.

Replaces the reference's per-structure eager loop (apply_model.ipynb cell 6,
profiling.py:68-105) with a TPU-native design: one compiled forward per
(atom-bucket, residue-bucket) shape, vmapped over a batch axis, fed by the
host-side encode/pad pipeline. Padding makes every call shape-static, so
XLA compiles each bucket exactly once per process.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .batching import PaddedStructure, attach_gather_tables, encode_and_pad, stack_batch
from .models import PestoConfig, PestoModel
from .port import load_reference_checkpoint
from .structure import concatenate_chains, preprocess_structure


class Predictor:
    """Bucketed jitted inference on padded structures."""

    def __init__(self, cfg: PestoConfig, params, knn_method: str = "exact",
                 mesh=None):
        import threading

        # created eagerly: a lazy check-then-set would race on the first
        # pair of concurrent predict_batch calls
        self._pb_lock = threading.Lock()
        self.cfg = cfg
        self.model = PestoModel(cfg)
        self.params = params
        # production default "exact" (round-4 measurement): exact2's
        # premise — values-only TopK passes beating one indexed pass —
        # died with this toolchain's index-tracking multiplier (0.95x,
        # was 3x), and its overflow fallback fired on EVERY serving
        # chunk at the shipped k+32 slack (docs/PERFORMANCE.md §4 has
        # the post-mortem; scripts/exp_exact2_slack.py the numbers).
        # "fast": approx kNN, far-tail swaps only, ~1.7x cheaper.
        self.knn_method = knn_method
        # how many fused-serve dispatches hit the exact2/pallas overflow
        # fallback (the batch silently re-ran the plain exact path);
        # exposed via serve.py /v1/stats and a predict_batch log line.
        # Lock because concurrent predict_batch callers (serve.py handler
        # threads) increment it and '+=' is not atomic under threading.
        import queue as _queue
        import threading as _threading

        self.knn_fallback_count = 0
        self._fallback_lock = _threading.Lock()
        # cumulative per-stage host-side timers for predict_batch
        # (record encode pool, stacked-batch encode, blocked device
        # readback). Serving reads these through /v1/stats to name the
        # throughput ceiling (round-5 serving instrumentation); stages
        # OVERLAP under the software pipeline, so these are attribution
        # aids, not a wall-clock decomposition.
        self.stage_ms = {"record_encode": 0.0, "batch_encode": 0.0,
                         "device_wait": 0.0, "batch_calls": 0}
        # predict_batch runs CONCURRENTLY from multiple service threads
        # (serve.py overlaps batch N+1's host encode with batch N's
        # device wait — the round-5 single-thread batcher ceiling), so
        # the timers get their own lock and each call checks a private
        # BatchEncoder out of a small idle pool instead of sharing one.
        self._stage_lock = _threading.Lock()
        self._enc_pool: "queue.Queue" = _queue.Queue()
        # created eagerly: two concurrent first calls racing the lazy
        # `self._knn_jit = {}` would drop one thread's cached compile
        self._knn_jit: dict = {}
        self.mesh = mesh  # data-parallel serving over a device mesh
        if mesh is None:
            # commit the parameters to the device ONCE: numpy params (the
            # torch-port output) are re-transferred host->device on every
            # jitted call otherwise — ~6 MB per chunk over the tunneled
            # runtime's ~73 MB/s H2D (~80 ms/dispatch of pure re-upload)
            self.params = jax.device_put(params)
        # one-hot MXU gather tables: built only when explicitly requested.
        # In bf16 they save ~0.4 ms/layer over the row gather, but SERVING
        # must round-trip the kNN ids to the host to build them (8 MB per
        # 4x8k batch) plus per-structure host work — keeping ids on device
        # and using the row gather wins end to end. Training (tables built
        # once per item by loader worker processes) keeps them via
        # TrainConfig.gather_tables.
        self.use_gather_tables = cfg.gather == "onehot"
        self._single = jax.jit(self._apply, static_argnames=("nr",))
        # batches flatten into the atom axis inside the model (faster than
        # vmap on TPU); same jitted entry point handles both ranks
        self._batched = self._single
        # fused serving program: batched kNN -> forward -> sigmoid in ONE
        # XLA dispatch. The tunneled runtime charges ~30-120 ms per
        # dispatch, so the 3-dispatch chain (kNN, forward, sigmoid) that
        # predict_batch used to issue per chunk paid that tax three times;
        # fusing also lets XLA overlap the kNN of the next lax-scheduled
        # work with nothing blocking on intermediate ids readbacks.
        # knn method rides as a STATIC jit arg so `pred.knn_method = "fast"`
        # after a first call retraces instead of silently reusing the
        # method baked into the cached trace
        self._fused_serve = jax.jit(
            self._knn_forward_sigmoid, static_argnames=("nr", "knn_method")
        )
        if mesh is not None:
            # DATA-PARALLEL SERVING: the fused chunk program (kNN ->
            # flat-batch forward -> sigmoid) runs under shard_map with the
            # batch axis split over 'data' and parameters replicated.
            # Structures are independent, so each device serves its own
            # shard with ZERO collectives (pinned by
            # tests/test_serving_mesh.py); throughput scales with the
            # mesh. predict_batch pads each chunk to a multiple of the
            # data-axis size.
            from jax.sharding import PartitionSpec as P

            from .parallel.mesh import replicated_sharding

            self._n_data = int(mesh.shape["data"])
            self.params = jax.device_put(params, replicated_sharding(mesh))

            def _serve_sharded(params, X, q, M, am, nr=None, knn_method="exact"):
                fn = lambda p, x, qq, mm, a: self._knn_forward_sigmoid(  # noqa: E731
                    p, x, qq, mm, a, nr=nr, knn_method=knn_method
                )
                return jax.shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                )(params, X, q, M, am)

            self._fused_serve = jax.jit(
                _serve_sharded, static_argnames=("nr", "knn_method")
            )

    @classmethod
    def from_reference_checkpoint(cls, path: str, cfg: PestoConfig = None,
                                  **kw) -> "Predictor":
        """cfg=None infers the variant from the checkpoint's tensor shapes
        (port.infer_variant), so callers need only the .pt path."""
        if cfg is None:
            params, cfg = load_reference_checkpoint(path)
            return cls(cfg, params, **kw)
        return cls(cfg, load_reference_checkpoint(path, cfg), **kw)

    def _apply(self, params, X, ids, q, M, am, cand=None, loc=None, nr=None):
        return self.model.apply({"params": params}, X, ids, q, M, am, cand, loc, nr=nr)

    def _knn_forward_sigmoid(self, params, X, q, M, am, nr=None,
                             knn_method="exact"):
        """Whole serving chunk as one XLA program: batched kNN topology,
        flat-batch forward, fp32 sigmoid. X/am: [B, NA(,3)].
        knn_topology_batch (not a bare vmap) keeps the pallas method's
        overflow fallback a real scalar-cond branch. knn_method is passed
        (never read from self inside the trace) so mutating
        pred.knn_method takes effect on the next call.

        Returns (probs [B, NR, C], overflow [B] bool) — the overflow flag
        (broadcast per structure so it shards with the batch axis under
        shard_map) records whether the exact2/pallas candidate
        construction overflowed and the chunk re-ran the exact path."""
        from .topology import knn_topology_batch

        out = knn_topology_batch(X, am, k=64, method=knn_method,
                                 with_overflow=True)
        ids, ovf = out[0], out[-1]
        z = self.model.apply({"params": params}, X, ids, q, M, am, nr=nr)
        probs = jax.nn.sigmoid(z.astype(jnp.float32))
        return probs, jnp.broadcast_to(ovf, (X.shape[0],))

    def export_compiled(self, path: str, buckets=((512, 64),)) -> None:
        """Serialize the forward as portable StableHLO artifacts
        (jax.export), one per bucket, for deployment without tracing the
        model. Load with Predictor.load_exported."""
        import pickle

        from jax import export as jexport

        from .synthetic import random_padded_structure

        blobs = {}
        for na, nr in buckets:
            ps = random_padded_structure(
                n_atoms=min(na - 1, 64), n_res=min(nr, 8),
                n_features=self.cfg.em_n0, na=na, nr=nr,
            )
            exp = jexport.export(jax.jit(self._apply))(
                self.params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask
            )
            blobs[(na, nr)] = exp.serialize()
        with open(path, "wb") as f:
            pickle.dump({"buckets": blobs}, f)

    @staticmethod
    def load_exported(path: str):
        """Load exported artifacts; returns {(na, nr): callable(params,
        X, ids, q, M, am) -> logits}."""
        import pickle

        from jax import export as jexport

        with open(path, "rb") as f:
            data = pickle.load(f)
        return {
            bucket: jexport.deserialize(blob).call
            for bucket, blob in data["buckets"].items()
        }

    def warmup(self, buckets=None, batch_sizes=(1,)) -> None:
        """Precompile BOTH serving entry points for the given (na, nr)
        buckets (all default buckets if None) so serving never pays a
        first-compile stall: the explicit-topology forward (logits) and,
        for batch sizes > 1, the fused predict_batch program
        (kNN -> forward -> sigmoid in one dispatch — warming only logits
        would leave predict_batch's actual program cold). Combine with
        utils.enable_compilation_cache() to persist across processes."""
        from .batching import ATOM_BUCKETS, RES_BUCKETS
        from .synthetic import random_padded_structure

        if buckets is None:
            # mega buckets (>32k atoms) compile on demand, not at warmup.
            # Pair each atom bucket with the residue bucket real proteins
            # hit (~8 atoms/residue): a positional zip drifted once the
            # atom ladder gained entries and warmed shapes traffic never
            # uses while leaving the real ones cold
            from .batching import pick_bucket as _pb

            buckets = [
                (na, _pb(max(na // 8, RES_BUCKETS[0]), RES_BUCKETS))
                for na in ATOM_BUCKETS if na <= 32768
            ]
        compact = sum(self.cfg.feature_flags) == 1 and not self.use_gather_tables
        for na, nr in buckets:
            ps = random_padded_structure(
                n_atoms=min(na - 1, 64), n_res=min(nr, 8),
                n_features=self.cfg.em_n0, na=na, nr=nr,
            )
            for b in batch_sizes:
                target = stack_batch([ps] * b) if b > 1 else ps
                jax.block_until_ready(self.logits(target))
                sharded_ok = self.mesh is None or b % self._n_data == 0
                if b > 1 and not self.use_gather_tables and sharded_ok:
                    # the fused serving program, at the same shapes
                    # predict_batch dispatches (compact int codes when the
                    # config is single-vocabulary, like BatchEncoder)
                    X = np.asarray(target.X)
                    am = np.asarray(target.atom_mask)
                    if compact:
                        q = np.zeros((b, na), np.int32)
                        M = np.zeros((b, na), np.int32)
                        nr_static = nr
                    else:
                        q = np.asarray(target.q)
                        M = np.asarray(target.M)
                        nr_static = None
                    jax.block_until_ready(self._fused_serve(
                        self.params, X, q, M, am, nr=nr_static,
                        knn_method=self.knn_method,
                    ))

    def logits(self, ps: PaddedStructure) -> jax.Array:
        """Per-residue logits [NR, C] (or [B, NR, C] for batches).

        Compact batches (integer q/M codes) pass the static residue count
        via res_mask's trailing dimension."""
        fn = self._batched if ps.X.ndim == 3 else self._single
        nr = int(ps.res_mask.shape[-1]) if np.issubdtype(ps.M.dtype, np.integer) else None
        return fn(
            self.params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask,
            ps.gather_cand, ps.gather_loc, nr=nr,
        )

    def _compact_spec(self):
        """(vocab, field) when the feature set is a single vocabulary
        one-hot (the flagship uses element-only) — the compact integer-
        code encoding applies; None for multi-vocabulary configs."""
        flags = self.cfg.feature_flags
        if sum(flags) != 1:
            return None
        from .encoding import std_elements, std_names, std_resnames

        vocab, field = [
            (std_elements, "element"), (std_resnames, "resname"),
            (std_names, "name"),
        ][list(flags).index(True)]
        assert self.cfg.em_n0 == len(vocab) + 1, (
            "compact codes require em_n0 == len(vocab)+1"
        )
        return vocab, field

    def _encode_record(self, s):
        """Structure record -> host arrays: COMPACT 4-tuple (X, q_codes,
        rid_codes, n_res) or dense 3-tuple (X, q, M). The single shared
        encode for predict_batch and predict_structure_sp."""
        from .encoding import encode_features, encode_structure, vocab_codes

        X = np.asarray(s["xyz"], dtype=np.float32)
        spec = self._compact_spec()
        if spec is not None:
            vocab, field = spec
            _, rid = np.unique(np.asarray(s["resid"]), return_inverse=True)
            qc = vocab_codes(s[field], vocab)
            return X, qc, rid.astype(np.int32), int(rid.max()) + 1
        Xd, M = encode_structure(s)
        feats = encode_features(s)
        flags = self.cfg.feature_flags
        q = np.concatenate([f for f, fl in zip(feats, flags) if fl], axis=1)
        return Xd, q, M

    def probabilities(self, ps: PaddedStructure) -> np.ndarray:
        # always float32 on host (bf16 outputs are not numpy-interoperable)
        return np.asarray(jax.nn.sigmoid(self.logits(ps).astype(jnp.float32)))

    def predict_structure(self, structure: dict) -> np.ndarray:
        """Cleaned+concatenated structure record -> [n_res, C] probs."""
        ps = encode_and_pad(
            structure, feature_flags=self.cfg.feature_flags, knn_method=self.knn_method,
            with_gather_tables=self.use_gather_tables,
        )
        nr = int(np.sum(np.asarray(ps.res_mask)))
        return self.probabilities(ps)[:nr]

    def predict_structure_sp(self, structure: dict, mesh) -> np.ndarray:
        """Mega-structure inference: the atom axis shards over the mesh's
        'model' axis (sequence-parallel analog), so structures beyond any
        single-chip bucket serve across chips. The kNN topology runs
        single-device first (blocked Gram form handles any NA); the
        32-layer forward then runs sharded. Uses compact integer codes
        when the config is single-vocabulary (the flagship) so host
        arrays stay O(N). Returns [n_res, C] probabilities."""
        from .batching import ATOM_BUCKETS, RES_BUCKETS, pick_bucket
        from .parallel.mesh import replicated_sharding
        from .parallel.sp import make_sp_serve
        from .topology import knn_topology

        rec = self._encode_record(structure)
        compact = len(rec) == 4
        X = rec[0]
        n = X.shape[0]
        n_res = rec[3] if compact else rec[2].shape[1]
        if compact and n == 0:
            n_res = 0

        na = pick_bucket(n + 1, ATOM_BUCKETS)
        nr = pick_bucket(max(n_res, 1), RES_BUCKETS)
        Xp = np.zeros((na, 3), np.float32)
        Xp[1 : n + 1] = X
        am = np.zeros((na,), np.float32)
        am[1 : n + 1] = 1.0
        if compact:
            qp = np.zeros((na,), np.int32)
            qp[1 : n + 1] = rec[1]
            Mp = np.zeros((na,), np.int32)
            Mp[1 : n + 1] = rec[2]
        else:
            qp = np.zeros((na, rec[1].shape[1]), np.float32)
            qp[1 : n + 1] = rec[1]
            Mp = np.zeros((na, nr), np.float32)
            Mp[1 : n + 1, :n_res] = rec[2]

        nr_static = nr if compact else None
        # keyed cache under the Predictor lock (the same check-then-set
        # race predict_batch guards against): alternating residue buckets
        # or meshes must not evict each other's compiled sharded forward
        # or re-replicate the params per call
        with self._pb_lock:
            cache = getattr(self, "_sp_serve_cache", None)
            if cache is None:
                cache = self._sp_serve_cache = {}
            # keyed by mesh CONTENT (devices + axis layout), not identity:
            # callers that build a fresh equal Mesh per call (the README
            # one-liner) must hit the cached compile, and the cache must
            # not grow per call
            key = (
                tuple(d.id for d in np.ravel(mesh.devices)),
                tuple(mesh.axis_names),
                mesh.devices.shape,
                nr_static,
            )
            if key not in cache:
                sp_fn = make_sp_serve(self.cfg, mesh, nr=nr_static)
                sp_params = jax.device_put(self.params, replicated_sharding(mesh))
                cache[key] = (mesh, sp_fn, sp_params)
            _, fn, params = cache[key]

            if not hasattr(self, "_knn_single_jit"):
                self._knn_single_jit = jax.jit(
                    lambda x, a, method: knn_topology(x, a, k=64, method=method)[0],
                    static_argnums=2,
                )
        ids = self._knn_single_jit(
            jnp.asarray(Xp), jnp.asarray(am), self.knn_method
        )
        probs = fn(params, Xp, ids, qp, Mp, am)
        return np.asarray(probs)[:n_res]

    def predict_pdb_file(self, path: str) -> Tuple[dict, np.ndarray]:
        """Raw PDB or mmCIF file -> (preprocessed merged structure,
        [n_res, C] probs).

        Mirrors the reference inference chain (apply_model.ipynb cell 6):
        read -> clean -> tag -> split -> filter -> dedup -> concat -> model.
        mmCIF input is a capability beyond the reference (which reads only
        legacy PDB, src/structure_io.py).
        """
        from .io import read_structure

        subunits = preprocess_structure(read_structure(path))
        structure = concatenate_chains(subunits)
        return structure, self.predict_structure(structure)

    def predict_pdb_files(
        self,
        paths: list,
        num_threads: int = 8,
        atoms_per_call: int = 32768,
        pipeline_depth: int = 2,
    ) -> Tuple[list, list]:
        """Folder-scale inference: PDB/mmCIF paths -> (structures, probs),
        both aligned with `paths`.

        Parse + the host preprocessing chain (read -> clean -> tag ->
        split -> filter -> dedup -> concat) run in a thread pool,
        mirroring the reference's production pipelines which parse in 8
        DataLoader workers (interfaceome/apply_model.py:55,
        model/main.py:37). Measured on-chip over 64 pdbs_test files
        (docs/artifacts/pdb_folder_parse.json): threading is throughput-
        NEUTRAL on that workload (49.9k atoms/s vs 51.0k serial) —
        parse is only ~5 ms/file (~10% of the window) and the numpy
        preprocess chain holds the GIL — so the value of this API is
        folder-scale convenience and robustness, not speed. A path that
        cannot be parsed degrades to a (None, None) pair with a stderr
        warning — the reference's per-item (None, path) contract
        (src/dataset.py:132-136).
        """
        import sys as _sys
        from concurrent.futures import ThreadPoolExecutor

        from .io import read_structure

        def load(path):
            try:
                return concatenate_chains(
                    preprocess_structure(read_structure(path))
                )
            except Exception as e:
                print(f"ReadError: {path}: {e}", file=_sys.stderr)
                return None

        with ThreadPoolExecutor(max(1, int(num_threads))) as pool:
            structures = list(pool.map(load, paths))
        keep = [s for s in structures if s is not None]
        probs_kept = (
            self.predict_batch(
                keep, atoms_per_call=atoms_per_call,
                pipeline_depth=pipeline_depth,
            )
            if keep else []
        )
        it = iter(probs_kept)
        probs = [next(it) if s is not None else None for s in structures]
        return structures, probs

    def predict_batch(
        self,
        structures: list,
        atoms_per_call: int = 32768,
        num_threads: int = 8,
        pipeline_depth: int = 2,
    ) -> list:
        """Predict a list of structure records, grouping into per-bucket
        batches for throughput (batch size capped by an atom budget per
        device call). Returns a list of [n_res_i, C] arrays; entries for
        structures that cannot be predicted (over the largest atom/residue
        bucket) are None, with a warning on stderr — one bad item never
        fails the batch.

        Serving pipeline: host encode (Morton sort + pad) runs in a thread
        pool, then each chunk is ONE fused XLA dispatch (batched kNN ->
        flat-batch forward -> fp32 sigmoid) — the tunneled runtime charges
        tens of ms per dispatch, so the former kNN/forward/sigmoid
        3-dispatch chain paid that tax three times per chunk. Up to
        `pipeline_depth` chunks stay in flight on the device while the
        host encodes the next one and reads back the oldest (BatchEncoder
        double-buffers host arrays for exactly this)."""
        from concurrent.futures import ThreadPoolExecutor

        from .batching import BatchEncoder

        import queue as _queue

        pool = ThreadPoolExecutor(num_threads)
        # concurrent predict_batch calls are supported (serve.py runs two
        # batcher threads so batch N+1's host encode overlaps batch N's
        # device wait); each call checks a PRIVATE BatchEncoder out of an
        # idle pool — the encoder's buffered host arrays are reused across
        # chunks, so two calls sharing one would overwrite each other's
        # staging buffers. The encoder must rotate depth+1 buffer sets: a
        # consumer holding `depth` pending chunks re-encodes into chunk
        # k-depth's slot otherwise, overwriting buffers the CPU backend
        # may still alias into the in-flight computation.
        need_sets = max(2, int(pipeline_depth) + 1)
        enc = None
        try:
            enc = self._enc_pool.get_nowait()
            if enc.n_sets < need_sets:
                enc.close()
                enc = None
        except _queue.Empty:
            pass
        if enc is None:
            enc = BatchEncoder(num_threads, n_sets=need_sets)
        try:
            return self._predict_batch_impl(
                structures, atoms_per_call, pool, pipeline_depth, enc
            )
        finally:
            self._enc_pool.put(enc)

    def _predict_batch_impl(self, structures, atoms_per_call, pool,
                            pipeline_depth, batch_encoder):
        from collections import deque

        import jax

        from .batching import ATOM_BUCKETS, RES_BUCKETS, pick_bucket

        try:

            # COMPACT encode (integer codes, expanded on device) whenever
            # the feature set is a single vocabulary one-hot (the flagship
            # uses element-only): kills the dense q and M host arrays and
            # their H2D transfer (M alone is NAxNR f32)
            compact = self._compact_spec() is not None
            host_encode = self._encode_record

            def host_encode_safe(arg):
                """Per-item tolerance: a malformed record (empty xyz,
                missing field, ...) degrades to None instead of raising
                out of pool.map and failing the whole batch — the
                documented contract (reference returns (None, path) for
                unusable items, src/dataset.py:132-136)."""
                i, s = arg
                try:
                    return host_encode(s)
                except Exception as e:  # noqa: BLE001 — per-item contract
                    import sys as _sys

                    print(f"EncodeError: structure {i}: {type(e).__name__}: {e}",
                          file=_sys.stderr)
                    return None

            import time as _time

            _t0 = _time.perf_counter()
            recs = list(pool.map(host_encode_safe, enumerate(structures)))
            with self._stage_lock:
                self.stage_ms["record_encode"] += (
                    (_time.perf_counter() - _t0) * 1e3)
                self.stage_ms["batch_calls"] += 1
            buckets: Dict[tuple, list] = {}
            for i, rec in enumerate(recs):
                if rec is None:
                    continue
                n_res = rec[3] if compact else rec[2].shape[1]
                try:
                    key = (
                        pick_bucket(rec[0].shape[0] + 1, ATOM_BUCKETS),
                        pick_bucket(max(n_res, 1), RES_BUCKETS),
                    )
                except ValueError as e:
                    # over-bucket structure: degrade per-item (reference
                    # returns (None, path) for unusable items,
                    # src/dataset.py:132-136) instead of failing the batch
                    import sys as _sys

                    print(f"SizeError: structure {i}: {e}", file=_sys.stderr)
                    continue
                buckets.setdefault(key, []).append(i)
            out = [None] * len(structures)

            def submit(chunk, na, nr):
                """Encode + dispatch one chunk; returns device PROBS
                without a host sync, so later chunks' host encodes overlap
                this chunk's device execution."""
                _te = _time.perf_counter()
                batch = batch_encoder.encode(
                    [recs[i] for i in chunk], na=na, nr=nr, spatial_sort=True,
                    n_features=self.cfg.em_n0,
                )
                with self._stage_lock:
                    self.stage_ms["batch_encode"] += (
                        (_time.perf_counter() - _te) * 1e3)
                if self.use_gather_tables:
                    # one-hot gather tables need the kNN ids on the host;
                    # this path keeps the separate-kNN pipeline
                    ids_host = np.asarray(self._batched_knn(
                        jax.device_put(batch.X), jax.device_put(batch.atom_mask)
                    ))
                    items = [
                        attach_gather_tables(
                            PaddedStructure(
                                X=batch.X[j], ids_topk=ids_host[j],
                                q=batch.q[j], M=batch.M[j],
                                atom_mask=batch.atom_mask[j],
                                res_mask=batch.res_mask[j],
                            ),
                            u_fixed=1024,
                        )
                        for j in range(len(chunk))
                    ]
                    sb = stack_batch(items)
                    return (
                        jax.nn.sigmoid(self.logits(sb).astype(jnp.float32)),
                        None,
                    )
                # fused path: ONE dispatch for kNN + forward + sigmoid.
                # jit's implicit host->device transfer of the numpy batch
                # copies before returning, so the encoder's double-buffered
                # arrays are safely reusable for later chunks.
                nr_static = (
                    int(batch.res_mask.shape[-1])
                    if np.issubdtype(batch.M.dtype, np.integer) else None
                )
                return self._fused_serve(
                    self.params, batch.X, batch.q, batch.M, batch.atom_mask,
                    nr=nr_static, knn_method=self.knn_method,
                )

            def collect(chunk, res_dev):
                import time as _time

                probs_dev, ovf_dev = res_dev
                _tc = _time.perf_counter()
                probs = np.asarray(probs_dev)
                with self._stage_lock:
                    self.stage_ms["device_wait"] += (
                        (_time.perf_counter() - _tc) * 1e3)
                if ovf_dev is not None and bool(np.any(np.asarray(ovf_dev))):
                    # exact2/pallas candidate overflow: the chunk silently
                    # re-ran the exact path — still exact, but worth a
                    # counter (serve.py /v1/stats) and a log line so a
                    # geometry regime where overflow is NOT rare is visible
                    import sys as _sys

                    with self._fallback_lock:
                        self.knn_fallback_count += 1
                    print(
                        f"knn-fallback: chunk of {len(chunk)} re-ran the "
                        f"exact path ({self.knn_method} candidate overflow)",
                        file=_sys.stderr,
                    )
                for j, i in enumerate(chunk):
                    n_res = recs[i][3] if compact else recs[i][2].shape[1]
                    out[i] = probs[j, :n_res]

            # software pipeline: up to pipeline_depth chunks in flight on
            # the device while the host encodes the next and drains the
            # oldest (the drain is the only host sync per chunk)
            depth = max(1, int(pipeline_depth))
            # mesh padding only applies to the shard_map'd fused path; the
            # gather-tables branch runs the plain single-program jit, so
            # padding its chunks would burn ndev-1 duplicate forwards for
            # nothing
            ndev = (
                getattr(self, "_n_data", 1)
                if self.mesh is not None and not self.use_gather_tables else 1
            )
            pending = deque()
            for (na, nr), group in buckets.items():
                # per-device atom budget; chunks padded to a multiple of
                # the data-axis size by repeating the first structure (the
                # padded rows' outputs are never collected)
                bmax = max(ndev, (atoms_per_call * ndev) // na)
                bmax -= bmax % ndev
                for k in range(0, len(group), bmax):
                    chunk = group[k : k + bmax]
                    # pad the dispatch to the next power of two (and the
                    # mesh multiple) by repeating the first structure —
                    # padded outputs are never collected. Arbitrary
                    # remainder sizes each cost a fresh multi-second XLA
                    # compile; powers of two bound the distinct compiled
                    # batch shapes per bucket to log2(bmax) at <2x waste
                    target = 1
                    while target < len(chunk):
                        target *= 2
                    target = min(max(target, ndev), max(bmax, ndev))
                    if target % ndev:
                        target += ndev - target % ndev
                    dispatch = chunk + [chunk[0]] * (target - len(chunk))
                    pending.append((chunk, submit(dispatch, na, nr)))
                    if len(pending) > depth:
                        collect(*pending.popleft())
            while pending:
                collect(*pending.popleft())
            return out
        finally:
            pool.shutdown(wait=False)

    def _batched_knn(self, Xb, ab):
        """Batched kNN over a stacked bucket batch (one compiled call;
        knn_topology_batch keeps the pallas overflow cond scalar)."""
        import functools

        import jax

        if not hasattr(self, "_knn_jit"):
            self._knn_jit = {}
        key = (Xb.shape[1], self.knn_method)
        if key not in self._knn_jit:
            from .topology import knn_topology_batch

            self._knn_jit[key] = jax.jit(
                functools.partial(knn_topology_batch, k=64, method=self.knn_method)
            )
        return self._knn_jit[key](Xb, ab)[0]
