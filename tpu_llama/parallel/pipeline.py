"""Pipeline parallelism: layer stages across device groups (SURVEY §2.4 PP).

The reference's layer loop (llama2.ts:215) becomes contiguous layer *stages*
placed on different devices/hosts — the 70B-across-hosts configuration where
tensor parallelism alone runs out of ICI (each stage can still be TP'd over
its own submesh; v1 places one stage per device).

Host-driven schedule: JAX's async dispatch pipelines the stages naturally —
submitting microbatch j+1 to stage 0 does not wait for microbatch j to clear
stage n-1, so prefill microbatches overlap across stages (1F inference
schedule; no bubbles beyond fill/drain).

Stage 0 owns the embedding; the last stage owns the final norm + classifier;
every stage owns the KV cache slice for its own layers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.models.llama import (
    KVCache,
    LayerParams,
    LlamaParams,
    apply_rope,
    make_kv_cache,
    matmul_any,
    rmsnorm,
)


def _slice_layers(lp: LayerParams, lo: int, hi: int) -> LayerParams:
    return jax.tree.map(lambda x: x[lo:hi], lp)


@dataclasses.dataclass
class StageSpec:
    first: bool
    last: bool
    n_layers: int


def split_stages(params: LlamaParams, n_stages: int):
    """Split stacked params into per-stage LlamaParams-like pytrees."""
    L = params.layers.rms_att.shape[0]
    bounds = np.linspace(0, L, n_stages + 1).astype(int)
    stub = jnp.zeros((1, 1), jnp.float32)  # placeholder for unused tensors
    stages = []
    for i in range(n_stages):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        stages.append((
            StageSpec(first=(i == 0), last=(i == n_stages - 1),
                      n_layers=hi - lo),
            LlamaParams(
                # only stage 0 embeds; only the last stage classifies —
                # other stages carry stubs (works for quantized wcls too)
                tok_emb=params.tok_emb if i == 0 else stub,
                layers=_slice_layers(params.layers, lo, hi),
                rms_final=params.rms_final,
                wcls=params.wcls if i == n_stages - 1 else stub,
                rope_cos=params.rope_cos,
                rope_sin=params.rope_sin,
            ),
        ))
    return stages


@partial(jax.jit, static_argnames=("config", "first", "last", "precision",
                                   "attn", "fused"), donate_argnums=(1,))
def _stage_decode(
    params: LlamaParams,
    cache,  # this stage's KV cache (n_layers_stage deep)
    x_or_tokens: jax.Array,  # [B] int32 if first else [B, D] activations
    pos: jax.Array,
    config: ModelConfig,
    first: bool,
    last: bool,
    precision: str = "default",
    attn: str = "xla",  # "flash" | "flash_dma" | "xla"
    fused: bool = False,  # fused W8A8 two-launch path (dense INT8 cache)
):
    """One PP stage's decode step, running the SAME perf stack as the
    single-chip engine (VERDICT r2 #4): deferred-flush flash kernels over
    int8/fp stacked caches (models.llama.decode_stack), or the fused
    one-linear-launch-per-layer path (fused_decode_stack) when the stage
    params carry fused W8A8 layouts.  "xla" stays as the debug path."""
    from tpu_llama.models.llama import decode_stack, fused_decode_stack

    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    x = params.tok_emb[x_or_tokens] if first else x_or_tokens
    cos = params.rope_cos[pos]
    sin = params.rope_sin[pos]
    if fused:
        x, new_cache = fused_decode_stack(
            params.layers, cache, x, pos, cos, sin, config,
            attn if attn in ("flash", "flash_dma") else "flash", 1)
        x = x.astype(jnp.float32)
    else:
        x, new_cache = decode_stack(params.layers, cache, x, pos, cos, sin,
                                    config, prec, attn, 1)
    if last:
        x = rmsnorm(x, params.rms_final)
        out = matmul_any(x, params.wcls, prec).astype(jnp.float32)
    else:
        out = x
    return out, new_cache


@partial(jax.jit, static_argnames=("config", "first", "last", "precision",
                                   "micro_offset", "attn"),
         donate_argnums=(1,))
def _stage_prefill(
    params: LlamaParams,
    cache,  # stage cache, full batch rows (KVCache or QuantKVCache)
    x_or_tokens: jax.Array,  # [mb, T] ids if first else [mb, T, D]
    lengths: jax.Array,  # [mb]
    config: ModelConfig,
    first: bool,
    last: bool,
    precision: str = "default",
    micro_offset: int = 0,
    attn: str = "xla",  # "flash" | "xla"
):
    """One PP stage's prefill of a microbatch.

    The microbatch's K/V accumulate in a COMPACT [Ls, mb, KVH, T, hd]
    block (scan ys) and land in the stage cache with ONE aliased Pallas
    slot-scatter — the previous per-layer ``cache.at[rows].set`` was an
    XLA full-batch-operand scatter per layer per microbatch, the exact
    pattern the decode side banned (VERDICT r2 weak #8).  Supports int8
    stage caches and the flash prefill kernel (same stack as single-chip).
    """
    from tpu_llama.models.llama import QuantKVCache, _attention_prefill
    from tpu_llama.ops.attention import (
        flash_prefill_attention,
        kv_cache_scatter_slots,
        quantize_kv,
    )

    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    x = params.tok_emb[x_or_tokens] if first else x_or_tokens
    mb, T = x.shape[0], x.shape[1]
    S = cache.seq_len
    quant = isinstance(cache, QuantKVCache)
    q_pos = jnp.broadcast_to(jnp.arange(T)[None, :], (mb, T))
    write_pos = jnp.clip(q_pos, 0, S - 1)
    cos = params.rope_cos[write_pos]
    sin = params.rope_sin[write_pos]
    rows = micro_offset + jnp.arange(mb)
    start0 = jnp.zeros((mb,), jnp.int32)

    def mm(a, w):
        return matmul_any(a, w, prec)

    from tpu_llama.models.llama import _project_gate_up, _project_qkv

    def layer_step(x, lp):
        h = rmsnorm(x, lp.rms_att)
        q, k, v = _project_qkv(h, lp, config, mm)  # fused-layout aware
        q = q.reshape(mb, T, config.n_heads, config.head_dim)
        k = k.reshape(mb, T, config.n_kv_heads, config.head_dim)
        v = v.reshape(mb, T, config.n_kv_heads, config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kt = k.transpose(0, 2, 1, 3)  # [mb, KVH, T, hd]
        vt = v.transpose(0, 2, 1, 3)
        if quant:
            kq, ks = quantize_kv(kt)
            vq, vs = quantize_kv(vt)
            if attn == "flash":
                att = flash_prefill_attention(
                    q, kq, vq, start0, ks, vs, max_keys=T).reshape(
                        mb, T, config.dim).astype(x.dtype)
            else:
                kf = kq.astype(jnp.float32) * ks[..., None]
                vf = vq.astype(jnp.float32) * vs[..., None]
                att = _attention_prefill(q, kf, vf, q_pos, config, prec)
            small = (kq, vq, ks, vs)
        else:
            kc = kt.astype(cache.k.dtype)
            vc = vt.astype(cache.v.dtype)
            if attn == "flash":
                att = flash_prefill_attention(
                    q, kc, vc, start0, max_keys=T).reshape(
                        mb, T, config.dim).astype(x.dtype)
            else:
                att = _attention_prefill(q, kc, vc, q_pos, config, prec)
            small = (kc, vc)
        x = x + mm(att, lp.wo)
        h = rmsnorm(x, lp.rms_ffn)
        gate, up = _project_gate_up(h, lp, config, mm)
        x = x + mm(jax.nn.silu(gate) * up, lp.w2)
        return x, small

    x, small = jax.lax.scan(layer_step, x, params.layers)
    use_kernel = T % 128 == 0 and T <= S
    if quant:
        kq, vq, ks, vs = small  # each stacked [Ls, mb, ...]
        if use_kernel:
            ck, cv, cks, cvs = kv_cache_scatter_slots(
                kq, vq, rows, cache.k, cache.v, ks, vs, cache.ks, cache.vs)
        else:
            ck = cache.k.at[:, rows, :, :T].set(kq)
            cv = cache.v.at[:, rows, :, :T].set(vq)
            cks = cache.ks.at[:, rows, :, :T].set(ks)
            cvs = cache.vs.at[:, rows, :, :T].set(vs)
        new_cache = QuantKVCache(k=ck, v=cv, ks=cks, vs=cvs)
    else:
        kc, vc = small
        if use_kernel:
            ck, cv = kv_cache_scatter_slots(kc, vc, rows, cache.k, cache.v)
        else:
            ck = cache.k.at[:, rows, :, :T].set(kc)
            cv = cache.v.at[:, rows, :, :T].set(vc)
        new_cache = KVCache(k=ck, v=cv)
    if last:
        # classifier only at each row's final valid position: [mb, V] leaves
        # the device instead of [mb, T, V] (32k*T floats/microbatch, VERDICT
        # r1 weak #5)
        x = jnp.take_along_axis(
            x, jnp.clip(lengths - 1, 0, T - 1)[:, None, None], axis=1)[:, 0]
        x = rmsnorm(x, params.rms_final)
        out = matmul_any(x, params.wcls, prec).astype(jnp.float32)
    else:
        out = x
    return out, new_cache


STAGE_AXIS = "stage"


def pp_device_greedy_decode(
    params: LlamaParams,
    config: ModelConfig,
    mesh: jax.sharding.Mesh,  # 1-D mesh over STAGE_AXIS
    cache,  # KVCache [L, B, KVH, S, hd] fp (stage-sharded by this fn)
    init_tokens: jax.Array,  # [B] int32 — first decode token per row
    init_pos: jax.Array,  # [B] int32 — its position (rows prefilled below)
    steps: int,
    precision: str = "highest",
    attn: str = "auto",  # "auto" | "xla" | "flash" | "flash_dma"
    fused: bool = False,  # fused (one-linear-launch) stage bodies — requires
    # ChannelQuant fused-projection params (the W8A8 production layout)
):
    """Device-side pipelined greedy decode: ONE jitted program for ALL
    stages and ALL tokens — no host dispatch between stages or steps.

    The host-driven ``PipelineRunner.decode`` pays the relay's ~27 ms
    dispatch+readback per stage per token (NEXT.md r3 #6) because every
    stage hand-off surfaces to Python.  Here the reference's layer loop
    (llama2.ts:215) staged across devices and its generate loop
    (llama2.ts:465-511) both live INSIDE one shard_map program:

      - the batch splits into ``n_stages`` microbatches that rotate around
        the stage ring — at every tick each stage runs its layer slice on
        the microbatch resident on it, then the activations ``ppermute``
        one hop along the ring (ICI, not host);
      - the last stage classifies, samples greedy (argmax, ties -> lowest
        id, llama2.ts:366-374), and the sampled token rides the same
        ppermute back to stage 0, which embeds it on arrival — the
        steady-state keeps ALL stages busy on different microbatches,
        unlike the host loop where stages idle 1/n_stages of the time;
      - the fill phase is handled with a validity flag that rides the
        ring: a stage holding a microbatch that has not yet entered
        stage 0 redirects its KV writes to the trash position S-1 and its
        (garbage) activations are never sampled.

    v2 (VERDICT r4 #7): the production stack runs inside the ring — int8
    QuantKVCache stage slices with the deferred-flush flash kernels
    (``attn="flash"``/``"flash_dma"``) and, with ``fused=True``, the
    one-linear-launch fused stage body (ops/fused_layer.py) — the same
    decode_stack/fused_decode_stack bodies the single-chip engine runs.
    ``attn="auto"`` picks flash for int8 caches, xla for dense fp (the
    parity/dryrun configuration).  Paged pool caches stay out of scope
    (PP serving shards requests, not pages, across stages).

    Returns (tokens [B, steps] int32, final cache).  Requires
    L % n_stages == 0, B % n_stages == 0, and max(init_pos) + steps < S-1
    (S-1 is the trash row for fill-phase writes).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tpu_llama.models.llama import decode_stack

    NS = mesh.shape[STAGE_AXIS]
    L = params.layers.rms_att.shape[0]
    B = int(init_tokens.shape[0])
    assert L % NS == 0 and B % NS == 0, (L, B, NS)
    Ls, MB = L // NS, B // NS
    S = cache.k.shape[3]
    # S-1 is the fill-phase trash row: real KV written there is corruption,
    # and init_pos/steps are host values so this is checkable up front.
    assert int(np.max(np.asarray(init_pos))) + steps < S - 1, (
        "pp_device_greedy_decode: max(init_pos) + steps must stay below "
        f"S-1={S - 1} (the fill-phase trash row); got "
        f"{int(np.max(np.asarray(init_pos)))} + {steps}")
    from tpu_llama.models.llama import QuantKVCache, fused_decode_stack

    if not isinstance(cache, (KVCache, QuantKVCache)):
        raise NotImplementedError(
            "pp_device_greedy_decode takes a dense KVCache (fp) or "
            "QuantKVCache (int8) — paged pool caches don't stage-shard "
            "(PP serving shards requests, not pages, across stages)")
    quant = isinstance(cache, QuantKVCache)
    if attn == "auto":
        attn = "flash" if quant else "xla"
    if fused and attn == "xla":
        raise ValueError("fused stage bodies use the flash kernel paths; "
                         "pass attn='flash' or 'flash_dma' (or 'auto')")
    scfg = dataclasses.replace(config, n_layers=Ls)
    prec = jax.lax.Precision(precision)
    K = steps
    D = config.dim

    # [L, ...] -> [NS, Ls, ...]: stage s's layer slice lands on device s
    layers_st = jax.tree.map(
        lambda a: a.reshape((NS, Ls) + a.shape[1:]), params.layers)
    cache_st = jax.tree.map(
        lambda a: a.reshape((NS, Ls) + a.shape[1:]), cache)

    def body(layers_s, tok_emb, rms_final, wcls, rope_cos, rope_sin,
             cache_s, init_tok, init_pos):
        s = jax.lax.axis_index(STAGE_AXIS)
        first = s == 0
        last = s == NS - 1
        layers_l = jax.tree.map(lambda a: a[0], layers_s)
        cache_l = jax.tree.map(lambda a: a[0], cache_s)
        ring = [(i, (i + 1) % NS) for i in range(NS)]

        def tick(t, carry):
            del t
            cache_l, x, tok, pos, valid, mbidx, cnt, out = carry
            row0 = mbidx * MB
            # stage 0 starts a microbatch's token: the fed-back sampled
            # token when the ring delivered a real one, else the host-
            # provided init token (the microbatch's FIRST decode input)
            it = jax.lax.dynamic_slice(init_tok, (row0,), (MB,))
            ip = jax.lax.dynamic_slice(init_pos, (row0,), (MB,))
            tok_use = jnp.where(valid, tok, it)
            pos_use = jnp.where(valid, pos, ip)
            valid_here = jnp.logical_or(valid, first)
            # fill-phase residents write KV to the trash row S-1
            pos_eff = jnp.where(valid_here, pos_use, S - 1)
            x_in = jnp.where(first, tok_emb[tok_use].astype(x.dtype), x)
            sub = jax.tree.map(
                lambda c: jax.lax.dynamic_slice_in_dim(c, row0, MB, axis=1),
                cache_l)
            if fused:
                y, sub = fused_decode_stack(
                    layers_l, sub, x_in.astype(jnp.float32), pos_eff,
                    rope_cos[pos_eff], rope_sin[pos_eff], scfg, attn, 1)
                y = y.astype(x.dtype)
            else:
                y, sub = decode_stack(layers_l, sub, x_in, pos_eff,
                                      rope_cos[pos_eff], rope_sin[pos_eff],
                                      scfg, prec, attn)
            cache_l = jax.tree.map(
                lambda c, u: jax.lax.dynamic_update_slice_in_dim(
                    c, u, row0, axis=1),
                cache_l, sub)
            logits = matmul_any(rmsnorm(y, rms_final), wcls, prec)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # the last stage records the sampled token for this microbatch
            write = jnp.logical_and(last, valid_here)
            k_ix = jnp.minimum(cnt[mbidx], K - 1)
            cur = jax.lax.dynamic_slice(out, (k_ix, row0), (1, MB))
            row = jnp.where(write, nxt[None], cur)
            out = jax.lax.dynamic_update_slice(out, row, (k_ix, row0))
            cnt = cnt.at[mbidx].add(write.astype(jnp.int32))
            # rotating state, one hop along the ring: activations forward,
            # (token, pos+1) from the last stage back to stage 0
            state = (y,
                     jnp.where(last, nxt, tok_use),
                     jnp.where(last, pos_use + 1, pos_use),
                     valid_here, mbidx)
            x, tok, pos, valid, mbidx = jax.tree.map(
                lambda a: jax.lax.ppermute(a, STAGE_AXIS, ring), state)
            return cache_l, x, tok, pos, valid, mbidx, cnt, out

        carry = (cache_l,
                 jnp.zeros((MB, D), params.tok_emb.dtype),
                 jnp.zeros((MB,), jnp.int32),
                 jnp.zeros((MB,), jnp.int32),
                 # valid == "the ROTATING state carries real data" — False
                 # everywhere at tick 0 (stage 0 starts microbatches from
                 # init_tok/init_pos, not from the zero carry; valid_here
                 # promotes its work to real)
                 jnp.zeros((), bool),
                 s,  # resident microbatch index at tick 0
                 jnp.zeros((NS,), jnp.int32),
                 jnp.zeros((K, B), jnp.int32))
        n_ticks = (K + 1) * NS - 1  # K full rounds + ring fill/drain
        carry = jax.lax.fori_loop(0, n_ticks, tick, carry)
        cache_l, out = carry[0], carry[7]
        return (jax.tree.map(lambda a: a[None], cache_l), out[None])

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(), P(), P(), P(), P(),
                  P(STAGE_AXIS), P(), P()),
        out_specs=(P(STAGE_AXIS), P(STAGE_AXIS)),
        check_rep=False,
    )
    new_cache_st, out_st = jax.jit(fn)(
        layers_st, params.tok_emb, params.rms_final, params.wcls,
        params.rope_cos, params.rope_sin, cache_st,
        jnp.asarray(init_tokens, jnp.int32), jnp.asarray(init_pos, jnp.int32))
    new_cache = jax.tree.map(
        lambda a: a.reshape((L,) + a.shape[2:]), new_cache_st)
    return out_st[NS - 1].T, new_cache  # [B, steps], stage-(NS-1) copy


class PipelineRunner:
    """Host-orchestrated inference pipeline over explicit device placements.

    ``tp > 1`` composes PP x TP: each stage owns a ``tp``-device submesh
    (axes ``('data', 'model')`` with data=1); its layer weights and KV-cache
    heads shard over ``model`` per parallel/sharding.py and GSPMD inserts
    the per-stage collectives.  Activations crossing stage boundaries are
    replicated within the receiving submesh — the 70B-across-hosts layout
    (SURVEY §2.4: "each stage can still be TP'd over its own submesh")."""

    def __init__(self, params: LlamaParams, config: ModelConfig,
                 n_stages: int, batch: int, devices=None,
                 kv_dtype="float32", precision: str = "default",
                 seq_len: int | None = None, tp: int = 1,
                 attn: str = "auto", fused: str | bool = "auto"):
        devices = devices or jax.devices()[:n_stages * tp]
        assert len(devices) >= n_stages * tp, (len(devices), n_stages, tp)
        self.config = config
        self.precision = precision
        if attn == "auto":
            # same policy as forward_decode: flash kernels when the cache
            # is int8 or we're on real TPU; einsum for CPU fp tests
            attn = ("flash" if (kv_dtype == "int8"
                                or jax.default_backend() == "tpu")
                    else "xla")
        self.attn = attn
        self.stages = []
        if fused == "auto":
            from tpu_llama.models.llama import _fused_path_ok

            fused = (tp == 1 and kv_dtype == "int8"
                     and attn in ("flash", "flash_dma")
                     and _fused_path_ok(params, config))
        self.fused = bool(fused)
        for i, (spec, sparams) in enumerate(split_stages(params, n_stages)):
            scfg = dataclasses.replace(config, n_layers=spec.n_layers)
            cache = make_kv_cache(scfg, batch, kv_dtype=kv_dtype,
                                  seq_len=seq_len)
            if tp > 1:
                from jax.sharding import Mesh, NamedSharding
                from jax.sharding import PartitionSpec as P

                from tpu_llama.parallel.mesh import DATA_AXIS, MODEL_AXIS
                from tpu_llama.parallel.sharding import (
                    shard_cache,
                    shard_params,
                )

                group = np.array(devices[i * tp:(i + 1) * tp]).reshape(1, tp)
                mesh = Mesh(group, (DATA_AXIS, MODEL_AXIS))
                sparams = shard_params(sparams, mesh)
                cache = shard_cache(cache, mesh)
                put = NamedSharding(mesh, P())  # replicated within the stage
            else:
                sparams = jax.device_put(sparams, devices[i])
                cache = jax.device_put(cache, devices[i])
                put = devices[i]
            self.stages.append({"spec": spec, "params": sparams,
                                "cache": cache, "device": put, "config": scfg})

    def decode(self, tokens: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """One decode step through all stages. [B] -> logits [B, V]."""
        x = jnp.asarray(tokens, jnp.int32)
        posd = jnp.asarray(pos, jnp.int32)
        for st in self.stages:
            x = jax.device_put(x, st["device"])
            p = jax.device_put(posd, st["device"])
            x, st["cache"] = _stage_decode(
                st["params"], st["cache"], x, p, st["config"],
                st["spec"].first, st["spec"].last, self.precision,
                attn=self.attn, fused=self.fused)
        return np.asarray(x)

    def prefill(self, tokens: np.ndarray, lengths: np.ndarray,
                n_micro: int = 1) -> np.ndarray:
        """Pipelined prefill: the batch splits into ``n_micro`` microbatches;
        JAX async dispatch overlaps microbatch j on stage i with j-1 on
        stage i+1 (fill/drain bubbles only).  Returns last-position logits
        [B, V]."""
        B, T = tokens.shape
        assert B % n_micro == 0
        mb = B // n_micro
        pending = []
        for j in range(n_micro):
            sl = slice(j * mb, (j + 1) * mb)
            x = jnp.asarray(tokens[sl], jnp.int32)
            ln = jnp.asarray(lengths[sl], jnp.int32)
            for st in self.stages:
                xd = jax.device_put(x, st["device"])
                lnd = jax.device_put(ln, st["device"])
                xd, st["cache"] = _stage_prefill(
                    st["params"], st["cache"], xd, lnd, st["config"],
                    st["spec"].first, st["spec"].last, self.precision,
                    micro_offset=j * mb,
                    attn="flash" if self.attn != "xla" else "xla")
                x = xd  # flows to next stage; dispatch is async
            pending.append(x)
        # last stage already reduced to last-position logits [mb, V]
        return np.concatenate([np.asarray(x) for x in pending], axis=0)
