"""Multi-host execution: N processes, one global device mesh.

The reference's only scale-out is ``whisper_full_parallel`` — N host
threads inside ONE process sharing frozen weights
(/root/reference/thirdparty/whisper.cpp/whisper.cpp:5817-5930).  The
TPU-native replacement is multi-controller JAX: every host runs the same
program, ``jax.distributed.initialize`` joins them into one runtime whose
global mesh spans every chip of the slice.  Concurrent utterance streams
shard over ``dp`` across hosts (zero cross-stream traffic, so DCN carries
nothing after placement), while ``tp`` weight shards stay inside each
host's ICI domain.

Per-host flow (``MultiHostBatchTranscriber``):

1. every process computes mel for its LOCAL clips and contributes them to
   a globally-sharded batch via ``jax.make_array_from_process_local_data``;
2. the device-resident clip loop (decode/clip.py) runs SPMD — the same
   jitted program on every host, XLA inserting the few global reductions
   (the seek-loop continue predicate) as collectives;
3. each host drains ONLY its addressable shards and emits segments for the
   streams it owns.

Wire-up (identical on every host, e.g. under SLURM/GKE):

    from godot_whisper_tpu.parallel import dist
    dist.initialize()                      # GWT_COORDINATOR / GWT_NUM_PROCESSES /
                                           # GWT_PROCESS_ID env, or TPU metadata
    mesh = dist.stream_mesh(tp=1)
    mht  = dist.MultiHostBatchTranscriber(ctx, mesh)
    segs = mht.transcribe(local_clips, tparams)   # local in, local out

CPU testing: 2 processes x 4 virtual devices (tests/test_multihost.py)
exercise this end to end with gloo collectives.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decode.clip import ClipOutputs, ClipState
from ..decode.params import TranscribeParams
from .batch import BatchTranscriber
from .sharding import make_mesh, shard_params


# --------------------------------------------------------------------- init
def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: str = "gloo") -> None:
    """Join this process into a multi-host JAX runtime.

    Arguments fall back to ``GWT_COORDINATOR`` / ``GWT_NUM_PROCESSES`` /
    ``GWT_PROCESS_ID`` env vars; with none set, ``jax.distributed``'s own
    auto-detection (TPU pod metadata, SLURM, ...) applies.  Call before
    the first JAX computation on every host.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "GWT_COORDINATOR")
    if num_processes is None and os.environ.get("GWT_NUM_PROCESSES"):
        num_processes = int(os.environ["GWT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("GWT_PROCESS_ID"):
        process_id = int(os.environ["GWT_PROCESS_ID"])
    # CPU backends need an explicit cross-process collectives impl
    # (TPU rides ICI/DCN natively and ignores this setting).
    try:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def initialize_from_env() -> bool:
    """``initialize()`` iff ``GWT_COORDINATOR`` is set.  Returns whether a
    multi-host runtime was started — single-process callers proceed
    unchanged."""
    if os.environ.get("GWT_COORDINATOR"):
        initialize()
        return True
    return False


def stream_mesh(tp: int = 1) -> Mesh:
    """A ("dp","tp") mesh over ALL global devices with tp groups kept
    inside one process (ICI domain): requires tp | local_device_count."""
    n_local = jax.local_device_count()
    if n_local % tp != 0:
        raise ValueError(f"tp={tp} must divide local device count "
                         f"{n_local} so tp groups stay host-local")
    return make_mesh(dp=jax.device_count() // tp, tp=tp)


# ------------------------------------------------------------------ helpers
def _allgather_host(x: np.ndarray) -> np.ndarray:
    """Gather a small host value from every process (stacked on axis 0)."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x))


def _local_rows(arr: jax.Array) -> np.ndarray:
    """This process's contiguous block of a leading-axis dp-sharded global
    array (deduped across tp replicas), in global row order."""
    seen = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = s
    shards = [seen[k] for k in sorted(seen)]
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def globalize_params(params, mesh: Mesh, config):
    """Place a (possibly quantized) parameter pytree onto the global mesh.

    Leaves are pulled to host first: committed single-device arrays are not
    valid inputs to a cross-process device_put, identical host values are.
    """
    host = jax.tree_util.tree_map(np.asarray, params)
    return shard_params(host, mesh, config)


# -------------------------------------------------------------- transcriber
class MultiHostBatchTranscriber(BatchTranscriber):
    """Batched multi-stream transcription where the stream axis spans
    hosts.  Each process passes its LOCAL clips and receives segments for
    exactly those clips; globally the batch is one dp-sharded clip-loop
    dispatch (decode/clip.py)."""

    def __init__(self, ctx, mesh: Mesh):
        super().__init__(ctx)
        self.mesh = mesh
        self._dp = int(mesh.shape["dp"])
        # replicate/TP-shard the params over the global mesh once
        ctx.pipeline.params = globalize_params(
            ctx.pipeline.params, mesh, ctx.config)
        self._pred = jax.jit(self._pred_impl)

    @staticmethod
    def _pred_impl(done, seek, seek_end, w):
        import jax.numpy as jnp
        return (jnp.all(done | (seek + 100 >= seek_end)), jnp.max(w))

    # ------------------------------------------------------------- plumbing
    def _run_global(self, cd, params, state: ClipState) -> ClipState:
        # statics ride in as host numpy: a committed local jnp array mixed
        # into a multi-process jit is rejected, identical host values are
        # auto-replicated
        return cd._loop(params, state,
                        np.asarray(cd.fctx.static_suppress),
                        np.asarray(cd._init_tokens),
                        np.asarray(cd._temps_arr),
                        np.asarray(cd._use_past_arr))

    def _drain_local(self, state: ClipState) -> ClipOutputs:
        fields = (state.out_tokens, state.out_p, state.out_plog,
                  state.out_pt, state.out_ptsum, state.out_tid,
                  state.out_rl, state.out_seek, state.out_delta,
                  state.out_emitted, state.out_temp, state.out_steps,
                  state.w, state.seek, state.done, state.past_buf,
                  state.past_cnt)
        return ClipOutputs(*[_local_rows(a) for a in fields])

    def _globalize_state(self, local: ClipState) -> ClipState:
        def put(a):
            a = np.asarray(a)
            spec = P(*(("dp",) + (None,) * (a.ndim - 1)))
            return jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, spec), a)
        return ClipState(*[put(a) for a in local])

    # ------------------------------------------------------------ transcribe
    def transcribe(self, clips: List[np.ndarray],
                   tparams: Optional[TranscribeParams] = None) -> List:
        ctx = self.ctx
        pipe = ctx.pipeline
        tparams = tparams or TranscribeParams()
        if not self._eligible(tparams):
            raise ValueError(
                "multi-host batch mode supports greedy and beam/best_of "
                "decoding without host callbacks/grammar/auto-detect (the "
                "host-interactive paths cannot run SPMD); run those clips "
                "per-host via pipeline.full()")

        nproc = jax.process_count()
        counts = _allgather_host(np.asarray([len(clips)], np.int32))
        n_real = len(clips)
        # equalize local counts, then pad so dp divides the global batch
        L = int(counts.max())
        while (L * nproc) % self._dp != 0:
            L += 1
        dummy = np.zeros(int(16000 * 1.2), np.float32)
        padded = list(clips) + [dummy] * (L - n_real)

        prompt_init, no_timestamps = self._prompt_init(tparams)

        # local mel -> globally agreed frame capacity -> global batch
        mel_local, n_lens = pipe.mel.device_batch(padded)
        mel_local = np.asarray(mel_local)
        f_local = mel_local.shape[2]
        f_cap = int(_allgather_host(
            np.asarray([f_local], np.int32)).max())
        if f_local < f_cap:
            mel_local = np.pad(mel_local,
                               ((0, 0), (0, 0), (0, f_cap - f_local)))

        from ..audio.mel import frame_counts
        init_prompt_tokens: List[int] = []
        if tparams.initial_prompt:
            init_prompt_tokens = pipe.tokenizer.encode(tparams.initial_prompt)
        elif tparams.prompt_tokens:
            init_prompt_tokens = list(tparams.prompt_tokens)
        seeks, seek_ends, past_init = [], [], []
        for i, clip in enumerate(padded):
            _, n_len_org = frame_counts(len(clip))
            s0 = tparams.offset_ms // 10
            seeks.append(s0)
            if i >= n_real:
                seek_ends.append(0)      # padding row: never active
            else:
                seek_ends.append(n_len_org if tparams.duration_ms == 0
                                 else s0 + tparams.duration_ms // 10)
            past_init.append(list(init_prompt_tokens))

        B_global = L * nproc
        cd = self._clip_decoder(tparams, B_global, f_cap, prompt_init,
                                no_timestamps)
        local_state = cd.init_state(mel_local, n_lens, seeks, seek_ends,
                                    past_init=past_init, batch=L,
                                    to_device=False)
        state = self._globalize_state(local_state)

        segments: List[List] = [[] for _ in padded]
        ts_states = [{"t_beg": 0, "t_last": 0, "tid_last": 0}
                     for _ in padded]
        while True:
            state = self._run_global(cd, pipe.params, state)
            outs = self._drain_local(state)
            self._emit(outs, padded, segments, prompt_init, tparams,
                       no_timestamps, ts_states)
            done_all, wmax = self._pred(state.done, state.seek,
                                        state.seek_end, state.w)
            if bool(np.asarray(done_all)):
                break
            if int(np.asarray(wmax)) == 0:
                break
            state = cd.reset_windows(state)

        return segments[:n_real]
