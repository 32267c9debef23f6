"""Training loop: jitted mesh-parallel train step, EMA, checkpointing,
auto-resume, metric logging.

Replaces the reference's Lightning Trainer + callbacks stack
(training_calvin.py:59-150): one ``make_train_step`` compiled under
jit+GSPMD over a device mesh (gradient all-reduce inserted by XLA, replacing
DDP/NCCL), a plain epoch loop, orbax checkpoints monitoring
``eval_lh/avg_seq_len`` (max) like the reference's ModelCheckpoint
(conf/callbacks/calvin.yaml:15-23), newest-checkpoint auto-resume
(utils/utils.py:57-80), and gradient/expert telemetry
(mode_agent.py:304-363,466-511).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.agent import MoDEAgent
from ..parallel.mesh import (batch_sharding, make_mesh, replicated,
                             shard_batch)
from .optim import ema_decay_schedule, ema_update, make_optimizer
from .state import TrainState

logger = logging.getLogger(__name__)


def grad_telemetry(grads) -> Dict[str, jax.Array]:
    """Total + per-top-level-module gradient norms (the TPU analog of the
    reference's on_before_zero_grad telemetry, mode_agent.py:304-363)."""
    metrics = {}
    total_sq = 0.0
    inner = grads.get("inner_model", grads)
    for name, sub in inner.items():
        sq = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree.leaves(sub))
        total_sq = total_sq + sq
        if name.startswith("blocks_"):
            metrics[f"debug/{name}_grad_norm"] = jnp.sqrt(sq)
    metrics["debug/total_grad_norm"] = jnp.sqrt(total_sq)
    return metrics


def make_train_step(agent: MoDEAgent, optimizer: optax.GradientTransformation,
                    *, ema_kwargs: Optional[dict] = None,
                    log_grad_norms: bool = True,
                    preprocess_fn: Optional[Callable] = None) -> Callable:
    """Pure (state, batch) -> (state, metrics); jit it with sharded batch /
    replicated state for mesh data parallelism.

    ``preprocess_fn(batch, key) -> batch`` runs inside the jitted step (e.g.
    uint8 camera frames -> resize/shift/normalize via ops.image) so raw bytes
    ship to the device once and augmentation fuses with the forward pass."""
    ema_kwargs = ema_kwargs or {}

    def train_step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        if preprocess_fn is not None:
            rng, pkey = jax.random.split(rng)
            batch = preprocess_fn(batch, pkey)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, (metrics, bs_upd) = agent.training_loss(variables, batch, sub)
            return loss, (metrics, bs_upd)

        (loss, (metrics, bs_upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        decay = ema_decay_schedule(state.step, **ema_kwargs)
        if hasattr(optimizer, "update_with_ema"):
            # FusedAdamWEma: whole AdamW+apply+EMA update in one elementwise
            # pass per leaf (optim.py — ~2x the optax chain at flagship
            # scale, bit-identical numerics)
            opt_kw = {}
            if getattr(optimizer, "stochastic_round", False):
                rng, sr_key = jax.random.split(rng)
                opt_kw["key"] = sr_key
            params, opt_state, ema_params = optimizer.update_with_ema(
                grads, state.opt_state, state.params, state.ema_params,
                decay, **opt_kw)
        else:
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = ema_update(state.ema_params, params, decay)
        metrics["train/ema_rate"] = decay
        if log_grad_norms:
            metrics.update(grad_telemetry(grads))
        batch_stats = bs_upd if bs_upd else state.batch_stats
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state, ema_params=ema_params,
                                  rng=rng)
        return new_state, metrics

    return train_step


def _relay_consuming(state, state_formats, collect_failures=False):
    """Re-lay ``state`` to ``state_formats`` leaf by leaf, deleting each
    source buffer as soon as its copy lands.

    A whole-tree ``device_put`` holds the old AND new state resident at once
    — for the flagship TrainState (~10 GB of params/moments/EMA) that is a
    guaranteed RESOURCE_EXHAUSTED on a 16 GB v5e chip (observed on the real
    backend; the CPU tests never see it). Peak overhead here is one leaf.
    The input state's device buffers are consumed (donation semantics) —
    callers must use the returned tree, as both call sites do.

    ``collect_failures=True``: instead of raising when a leaf's requested
    layout cannot be materialized (both ``device_put`` and the compiled
    identity can be silently canonicalized by the axon backend, and WHICH
    layouts stick varies run to run), keep that leaf untouched and return
    ``(state, failed_leaf_indices)`` — :func:`jit_auto_layout` then
    recompiles with those leaves pinned to their current (default) layout.
    """
    flat, treedef = jax.tree.flatten(state)
    fmts = treedef.flatten_up_to(state_formats)
    out = []
    failed = []
    for i, (x, fmt) in enumerate(zip(flat, fmts)):
        if fmt is None:    # DCE'd arg: executable never reads it
            out.append(x)
            continue
        if not isinstance(x, jax.Array):
            out.append(jax.device_put(x, fmt))
            continue
        if (_layout_of(x) == _layout_of_fmt(fmt)
                and _sharding_matches(x, fmt)):
            out.append(x)
            continue
        try:
            try:
                y = jax.device_put(x, fmt)
                y.block_until_ready()
            except Exception:
                # some backends reject certain on-device relayouts with
                # INVALID_ARGUMENT (observed on the axon v5e relay for a
                # subset of XLA-chosen tiled formats). Do NOT fall back
                # through the host: fetching an XLA-chosen-layout array can
                # itself raise INVALID_ARGUMENT there (observed). A
                # compiled identity copy reads any committed layout and
                # usually honors its output layout.
                y = _relayout_via_jit(x, fmt)
                y.block_until_ready()
        except Exception:
            if collect_failures:   # transient backend flake or hard
                failed.append(i)   # rejection — keep the current layout,
                out.append(x)      # the caller recompiles against it
                continue
            raise
        want = _layout_of_fmt(fmt)
        if want is not None and _layout_of(y) != want:
            # the backend silently ignored the layout request — retry
            # through a compiled identity (unpinned, then pinned entry).
            # NB: a dishonoring device_put can return x ITSELF (treating
            # the request as a no-op), so every delete below is guarded.
            for pin in (False, True):
                if y is not x:
                    y.delete()
                try:
                    y = _relayout_via_jit(x, fmt, pin_entry=pin)
                    y.block_until_ready()
                except Exception:
                    y = x  # keep something defined for the check below
                    continue
                if _layout_of(y) == want:
                    break
            if _layout_of(y) != want:
                if collect_failures:
                    if y is not x:
                        y.delete()
                    failed.append(i)
                    out.append(x)
                    continue
                raise RuntimeError(
                    f"could not materialize requested layout: wanted "
                    f"{want}, got {_layout_of(y)} for "
                    f"shape {x.shape} {x.dtype}")
        if y is not x:
            x.delete()
        out.append(y)
    result = jax.tree.unflatten(treedef, out)
    if collect_failures:
        return result, failed
    return result


def _layout_of(x):
    fmt = getattr(x, "format", None)
    return None if fmt is None else fmt.layout


def _layout_of_fmt(fmt):
    return getattr(fmt, "layout", None)


def _sharding_matches(x, fmt):
    s = getattr(fmt, "sharding", None)
    if s is None:
        return True
    try:
        return x.sharding.is_equivalent_to(s, x.ndim)
    except Exception:
        return x.sharding == s


def _identity(a):
    return a


_RELAYOUT_JITS = {}


def _relayout_via_jit(x, fmt, pin_entry: bool = False):
    """Force ``x`` into ``fmt``'s layout through a compiled identity program.

    Last-resort relayout: the axon v5e relay's ``device_put`` SILENTLY
    ignores some layout requests (observed 2026-08-19: wanted
    ``(0,1,2,3) tiling ((4,128),(2,1))`` for a ``[7,7,3,64]`` conv kernel,
    got the backend-preferred ``(0,2,1,3) tiling ((8,128),(2,1))`` — even
    when fed from a host buffer), which later kills the AOT call with an
    opaque "compiled for input layouts that disagree" ValueError. XLA
    itself CAN produce the layout (the auto-layout executable requires it
    at entry), so route the copy through a jitted identity with the target
    Format as ``out_shardings``. The jitted identity is memoized per
    (shape, dtype, layout, sharding) — one tiny compile each, cached by the
    persistent compilation cache across processes."""
    from jax.experimental.layout import Format

    sh = getattr(fmt, "sharding", None) or x.sharding
    out_fmt = Format(fmt.layout, sh)
    in_layout = _layout_of(x) if pin_entry else None
    key = (x.shape, str(x.dtype), in_layout, fmt.layout, sh)
    jfn = _RELAYOUT_JITS.get(key)
    if jfn is None:
        jfn = jax.jit(_identity, out_shardings=out_fmt,
                      **({"in_shardings": Format(in_layout, x.sharding)}
                         if pin_entry else {}))
        _RELAYOUT_JITS[key] = jfn
    try:
        return jfn(x)
    except Exception:
        if pin_entry:
            raise
        # dispatch relayouts a default-entry program's inputs via transfer,
        # which the backend rejects when x holds an XLA-chosen tiled layout
        # — retry with the ENTRY format pinned to x's current layout (a
        # fallback only: pinned-entry identities were observed to have
        # their OUTPUT layout silently canonicalized in some runs)
        last = None
        for pause in (0.0, 0.5, 2.0):
            # the axon relay also fails this chain TRANSIENTLY (observed
            # 2026-08-20: the identical executable+relayout sequence passed
            # at 08:32 and died with INVALID_ARGUMENT at 08:51) — retry a
            # couple of times before giving up
            if pause:
                time.sleep(pause)
            try:
                return _relayout_via_jit(x, fmt, pin_entry=True)
            except Exception as e:
                last = e
        raise last


def _required_state_formats(compiled, state):
    """The entry Formats the compiled EXECUTABLE actually requires for the
    first (state) argument's leaves.

    Works around a jax 0.9 ``Compiled.input_formats`` misalignment: when the
    traced function carries hoisted constant args (``jaxpr_const_args`` —
    e.g. trace-time ``PRNGKey``/table constants), the executable's
    ``_xla_in_layouts`` is PREFIXED with one layout per const arg and
    filtered to ``_kept_var_idx`` (pxla.py ``_maybe_get_and_prepend_const_
    args``), but ``input_formats`` zips it against the user-arg leaves
    unshifted — so every leaf is reported with a neighbor's layout and the
    first call dies with an opaque "compiled for input layouts that
    disagree" ValueError (observed on the flagship train step: 4 conv1
    leaves, 2026-08-19). Reconstructs the correct per-leaf Format from the
    executable's own bookkeeping; falls back to ``input_formats`` if the
    internals move. DCE'd leaves get ``None`` (= leave the array as is; the
    executable drops them before the layout check)."""
    flat_state, state_treedef = jax.tree.flatten(state)
    try:
        ex = compiled._executable
        params = getattr(compiled, "_params", None)
        const_args = getattr(params, "const_args", None) or ()
        nconst = len(const_args)
        lay = ex._xla_in_layouts
        sh = ex._in_shardings
        pos = {k: j for j, k in enumerate(sorted(ex._kept_var_idx))}
        from jax.experimental.layout import Format
        fmts = []
        for i in range(len(flat_state)):
            j = pos.get(nconst + i)
            fmts.append(None if j is None else Format(lay[j], sh[j]))
    except Exception:
        return compiled.input_formats[0][0]
    # keep the treedef explicit: None entries are REAL leaves here (DCE'd
    # args), so unflatten against the state treedef with a leaf list
    return state_treedef.unflatten(fmts)


def _pin_state_out_formats(compiled, fn, state, state_shapes, example_args,
                           *, static_argnums, donate, in_sh, out_shardings):
    """Close the donate-feedback loop of an AUTO-layout executable.

    XLA may choose an OUTPUT layout for a state leaf that differs from the
    ENTRY layout it chose for the same leaf (observed on the flagship train
    step: stacked expert weights ``bf16[4,1024,8192]`` entry ``(0,2,1)`` vs
    output ``(0,1,2)``). Donation then cannot alias that buffer, and —
    worse — every chained call must relayout an EXECUTABLE-OUTPUT buffer
    back to the entry layout, a transfer the axon relay rejects with
    INVALID_ARGUMENT often enough to kill long runs (R5_TRAIN_QUEUE.log,
    2026-08-20: chunk 0 of the convergence smoke ran, every later chunk's
    relay died through every fallback path).

    When the output pytree leads with a state-shaped subtree, compare its
    formats against the entry formats; on mismatch, recompile with the
    state OUTPUTS pinned to the chosen entry formats. Entries stay AUTO
    (the relay compiler treats requested entry layouts as suggestions and
    pinning them has crashed remote-compile with HTTP 500 — see
    jit_auto_layout docstring), and out==in is byte-identical by
    construction, so aliasing is safe. Any failure falls back to the
    original executable (the per-call ``_relay`` retry chain remains)."""
    from jax.experimental.layout import Format, Layout

    try:
        state_treedef = jax.tree.structure(state)
        entry = _required_state_formats(compiled, state)
        out_f = compiled.output_formats
        otd = jax.tree.structure(out_f)
        kids = otd.children()
        if otd == state_treedef:
            out_state = jax.tree.leaves(out_f)
        elif kids and kids[0] == state_treedef:
            out_state = jax.tree.leaves(out_f)[:state_treedef.num_leaves]
        else:
            return compiled     # unknown output shape: nothing to pin
        entry_flat = jax.tree.flatten(entry, is_leaf=lambda x: x is None)[0]
        mism = [i for i, (e, o) in enumerate(zip(entry_flat, out_state))
                if e is not None and _layout_of_fmt(e) != _layout_of_fmt(o)]
        if not mism:
            return compiled
        logger.warning(
            "auto-layout: %d state leaf(s) compiled with out!=in layouts "
            "(donation cannot alias; chained calls would relayout "
            "executable outputs) — recompiling with pinned state outputs",
            len(mism))
        pin_state = state_treedef.unflatten(
            [Format(Layout.AUTO) if e is None else e for e in entry_flat])
        if otd == state_treedef:
            out_sh = pin_state
        elif isinstance(out_shardings, tuple):
            out_sh = (pin_state, *out_shardings[1:])
        else:   # None or a single broadcast spec: keep aux unconstrained
            out_sh = (pin_state,
                      Format(Layout.AUTO) if out_shardings is None
                      else out_shardings)
        jf = jax.jit(fn, static_argnums=static_argnums,
                     donate_argnums=(0,) if donate else (),
                     in_shardings=in_sh, out_shardings=out_sh)
        pinned = jf.lower(state_shapes, *example_args).compile()
        # verify both that the pin was honored and that the (re-chosen AUTO)
        # entry formats still match — otherwise keep the original
        entry2 = jax.tree.flatten(_required_state_formats(pinned, state),
                                  is_leaf=lambda x: x is None)[0]
        out2 = jax.tree.leaves(pinned.output_formats)
        still = [i for i, (e, o) in enumerate(zip(entry2, out2))
                 if e is not None and _layout_of_fmt(e) != _layout_of_fmt(o)]
        if still:
            logger.warning(
                "auto-layout: pinned recompile still has %d out!=in state "
                "leaf(s); keeping the original executable", len(still))
            return compiled
        return pinned
    except Exception as e:
        logger.warning("auto-layout: pinned-output recompile failed (%r); "
                       "keeping the original executable", e)
        return compiled


def jit_auto_layout(fn, state, *, static_argnums=(), example_args=(),
                    donate: bool = True, state_sharding=None,
                    rest_shardings=None, out_shardings=None,
                    reuse_formats=None):
    """Compile ``fn(state, *example_args)`` letting XLA choose the ENTRY
    layouts for every array (``Layout.AUTO``), and re-lay ``state`` out to
    match.

    Why: the default jit pins arguments to row-major layouts, and the
    flagship train step then spends ~13 ms/step transposing the stacked
    expert weights ``[E, D, F] {2,1,0} <-> {1,2,0}`` between the layout the
    forward einsum wants and the one the backward dot prefers (see
    docs/PERF.md "train step"). With AUTO entry layouts XLA materializes the
    parameters once in its preferred layout and the per-step copies vanish.
    Orbax checkpointing is unaffected: restore produces row-major arrays and
    the returned state has simply been ``device_put`` through the chosen
    formats.

    Returns ``(compiled_fn, state_in_chosen_layout)``. The compiled fn is
    specialized to ``example_args`` for the static argnums. The input
    ``state``'s device buffers are CONSUMED by the re-lay (donation
    semantics, see :func:`_relay_consuming`) — use the returned state.

    ``state_sharding`` (optional NamedSharding, or a pytree of them matching
    ``state`` — e.g. a dp×ep + ZeRO-1 sharded TrainState) pins the state's
    mesh sharding while leaving its layout AUTO; ``rest_shardings`` (optional
    tuple, one entry per non-state dynamic arg) pins the remaining args to
    concrete shardings/default layouts — used by :class:`Trainer` so host
    batches keep arriving through the normal ``shard_batch`` path.
    ``out_shardings`` (optional prefix pytree) pins outputs — pass a
    concrete sharding for outputs that downstream EAGER code touches (e.g.
    metrics), since some backends reject eager ops on XLA-chosen tiled
    layouts (see :func:`relayout_default`).

    ``reuse_formats`` (optional; pass a previous variant's
    ``.state_formats`` or simply ``True``): compile this variant against
    the CONCRETE state — entry layouts are exactly the layouts the state
    already holds (the previous variant's), with nothing requested AUTO or
    pinned. Used when compiling several variants of the same step body
    (different scan lengths / batch shapes): the state then never needs
    re-laying between variants. Explicit Format pinning is deliberately
    avoided: the axon compiler treats requested layouts as suggestions and
    can canonicalize the OUTPUT layout of a donated arg away from its
    pinned input layout to a different BYTE SIZE (observed: f32[7,7,3,64]
    T(8,128)=86016B in vs preferred T(4,128)=100352B out), which fails
    aliasing with an opaque remote-compile HTTP 500.
    """
    from jax.experimental.layout import Format, Layout
    from jax.sharding import Sharding

    # AUTO-layout args must be lowered as abstract shapes: a committed
    # jax.Array carries a concrete layout, which jit rejects against AUTO
    state_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if isinstance(x, jax.Array) else x, state)

    def _compile_concrete():
        """Compile against the CONCRETE state: entry layouts = exactly the
        layouts the state currently holds — callable by construction, and
        no explicit Format requests for the compiler to canonicalize."""
        in_sh = None if rest_shardings is None else (None, *rest_shardings)
        if out_shardings is None:
            out_sh = None
        elif isinstance(out_shardings, tuple):
            out_sh = (None, *out_shardings[1:])
        else:
            out_sh = out_shardings
        jf = jax.jit(fn, static_argnums=static_argnums,
                     donate_argnums=(0,) if donate else (),
                     in_shardings=in_sh, out_shardings=out_sh)
        return jf.lower(state, *example_args).compile()

    if reuse_formats is not None:
        # variant of an already-laid-out step: the state is already in the
        # first variant's layouts — compile directly against it
        compiled = _compile_concrete()
    else:
        if state_sharding is None:
            auto = Format(Layout.AUTO)
        elif isinstance(state_sharding, Sharding):
            auto = Format(Layout.AUTO, state_sharding)
        else:   # pytree of shardings, one per state leaf
            auto = jax.tree.map(lambda s: Format(Layout.AUTO, s),
                                state_sharding,
                                is_leaf=lambda x: isinstance(x, Sharding))
        in_sh = auto if rest_shardings is None else (auto, *rest_shardings)
        jf = jax.jit(fn, static_argnums=static_argnums,
                     donate_argnums=(0,) if donate else (),
                     in_shardings=in_sh,
                     out_shardings=(Format(Layout.AUTO)
                                    if out_shardings is None
                                    else out_shardings))
        compiled = jf.lower(state_shapes, *example_args).compile()
        compiled = _pin_state_out_formats(
            compiled, fn, state, state_shapes, example_args,
            static_argnums=static_argnums, donate=donate, in_sh=in_sh,
            out_shardings=out_shardings)
    state_formats = _required_state_formats(compiled, state)
    state, failed = _relay_consuming(state, state_formats,
                                     collect_failures=True)
    if failed:
        # The backend could not materialize the XLA-chosen layout for these
        # leaves (both device_put and the compiled-identity copy can be
        # silently canonicalized — observed for e.g. f32[7,7,3,64] wanting
        # tiling (4,128); WHICH layouts stick varies run to run). Recompile
        # against the CONCRETE committed arrays with unspecified state
        # shardings: the entry layouts are then exactly the layouts the
        # state already HAS (mostly the chosen ones — the relay above moved
        # every materializable leaf), so the executable is callable by
        # construction; XLA transposes the few stuck leaves in-program.
        # (Explicitly PINNING a mixed Format tree instead can crash the
        # remote-compile service with HTTP 500 — observed 2026-08-19.)
        logger.warning(
            "auto-layout: %d leaf(s) kept their current layout (backend "
            "would not materialize the chosen one); recompiling against "
            "the concrete state", len(failed))
        compiled = _compile_concrete()
        state_formats = _required_state_formats(compiled, state)
        state, failed = _relay_consuming(state, state_formats,
                                         collect_failures=True)
        if failed:
            flat_st = jax.tree.leaves(state)
            bad = [(flat_st[i].shape, str(flat_st[i].dtype)) for i in failed]
            raise RuntimeError(
                f"auto-layout: could not materialize entry layouts even "
                f"when compiling against the concrete state; offending "
                f"leaves: {bad}")
    static = set(static_argnums)

    # None entries are real leaves (DCE'd args) — keep them in the flat list
    flat_formats, fmt_treedef = jax.tree.flatten(
        state_formats, is_leaf=lambda x: x is None)

    def _relay(x, fmt):
        if fmt is None or not isinstance(x, jax.Array):
            return x        # DCE'd arg — the executable never reads it
        # steady state (donated output feeding back in) already matches —
        # compare layout + sharding equivalence instead of paying a
        # device_put dispatch per leaf (the executable-derived Format's
        # sharding object need not be ``==`` to the array's)
        want = _layout_of_fmt(fmt)
        if _layout_of(x) == want and _sharding_matches(x, fmt):
            return x
        try:
            try:
                try:
                    y = jax.device_put(x, fmt)
                except Exception:
                    # some backends reject certain on-device relayouts; a
                    # compiled identity copy reads any committed layout (a
                    # host round-trip would not: fetching XLA-chosen
                    # layouts can also fail there)
                    y = _relayout_via_jit(x, fmt)
            except Exception:
                # last resort, two hops via the DEFAULT layout: the relay
                # canonicalizes exotic-layout transfers, so exotic->exotic
                # can fail where exotic->default (a canonicalization) and
                # default->exotic (the same move that laid out the initial
                # state) each succeed (observed 2026-08-20 for the
                # bf16[7,7,3,64] conv kernel, T(8,128)->T(4,128))
                from jax.experimental.layout import Format, Layout
                dflt = Format(Layout(major_to_minor=tuple(range(x.ndim))),
                              x.sharding)
                y = _relayout_via_jit(x, dflt)
                try:
                    y = jax.device_put(y, fmt)
                except Exception:
                    y = _relayout_via_jit(y, fmt)
            if want is not None and _layout_of(y) != want:
                # backend silently ignored the layout request — compiled
                # identity copy as the honored fallback (_relayout_via_jit)
                y = _relayout_via_jit(x, fmt)
        except Exception as e:
            raise RuntimeError(
                f"auto-layout relay failed for leaf {x.shape} {x.dtype}: "
                f"have layout {_layout_of(x)}, want {want} "
                f"(sharding match: {_sharding_matches(x, fmt)})") from e
        return y

    def call(st, *args):
        # AOT-compiled fns take only the dynamic args; keep the jit-style
        # signature so call sites can toggle AUTO without changing shape.
        dyn = [a for i, a in enumerate(args, start=1) if i not in static]
        try:
            # direct call first: jax's AOT entry check validates layouts
            # from the executable's own metadata BEFORE dispatch, which is
            # authoritative — the axon relay was observed (2026-08-20) to
            # MISREPORT an output buffer's layout through ``.format``
            # ((0,1,2) reported vs the (0,2,1) the executable declares and
            # produces), which made the eager comparison below relayout a
            # perfectly valid feedback buffer and then die in the relay's
            # broken transfer paths. Nothing is donated until dispatch, so
            # a rejection here leaves ``st`` intact for the relay retry.
            return compiled(st, *dyn)
        except Exception:
            # only a PRE-dispatch entry/layout rejection leaves the donated
            # state intact. If dispatch already consumed the buffers (a
            # mid-execution failure: relay INVALID_ARGUMENT, OOM, ...),
            # retrying would relayout deleted arrays and bury the real
            # error — re-raise it instead.
            if any(getattr(x, "is_deleted", lambda: False)()
                   for x in jax.tree.leaves(st)):
                raise
        # entry rejected (a different producer: checkpoint restore, another
        # variant, a genuinely re-laid buffer) — re-lay to this program's
        # chosen formats and retry
        flat_st = jax.tree.leaves(st)
        st = jax.tree.unflatten(
            fmt_treedef, [_relay(x, f) for x, f in zip(flat_st, flat_formats)])
        return compiled(st, *dyn)

    call.state_formats = state_formats   # for reuse_formats= on variants
    return call, state


def relayout_default(tree):
    """Re-lay every array in ``tree`` back to the default (row-major) device
    layout.

    Needed after training through :func:`jit_auto_layout`: arrays in an
    XLA-chosen layout flow fine through *jitted* programs, but EAGER ops on
    them fail on the axon backend (INVALID_ARGUMENT), so call this before
    handing e.g. ``state.ema_params`` to un-jitted eval/export code."""
    from jax.experimental.layout import Format, Layout

    def _is_default(x, fmt):
        # a layout can have the row-major major_to_minor but an EXOTIC
        # TILING (XLA-chosen) — such arrays also fail eager use/dispatch
        # transfers on the axon backend, so compare against the backend's
        # true default layout (jax's own dispatch predicate)
        try:
            from jax._src.interpreters.pxla import is_default_layout
            return is_default_layout(fmt.layout, fmt.sharding, x.aval)
        except Exception:
            return fmt.layout.major_to_minor == tuple(range(x.ndim))

    def relay(x):
        if not isinstance(x, jax.Array):
            return x
        default = tuple(range(x.ndim))
        fmt = getattr(x, "format", None)
        if fmt is None or fmt.layout is None or _is_default(x, fmt):
            return x
        target = Format(Layout(major_to_minor=default), fmt.sharding)
        try:
            return jax.device_put(x, target)
        except Exception:
            # some backend/format combinations reject an on-device relayout
            # (axon raises INVALID_ARGUMENT for certain tiled layouts), and
            # a host round-trip is no escape: FETCHING an XLA-chosen-layout
            # array can raise the same error there. A compiled identity
            # copy reads any committed layout (see _relayout_via_jit).
            return _relayout_via_jit(x, target)

    return jax.tree.map(relay, tree)


class MetricLogger:
    """wandb if available and configured, else JSONL + stdout."""

    def __init__(self, log_dir: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                logger.warning("wandb unavailable; logging to JSONL only")

    def log(self, metrics: Dict[str, Any], step: int):
        record = {"step": int(step)}
        for k, v in metrics.items():
            if hasattr(v, "shape") and np.ndim(v) > 0:
                record[k] = np.asarray(v).tolist()
            else:
                record[k] = float(v)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "step"},
                            step=step)

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


class CheckpointManager:
    """orbax-backed save/restore with best-metric tracking + auto-resume
    (reference: ModelCheckpoint on eval_lh/avg_seq_len max + EMA-in-callback
    state + get_last_checkpoint)."""

    def __init__(self, ckpt_dir: str, monitor: str = "eval_lh/avg_seq_len",
                 mode: str = "max", save_top_k: int = 1):
        import orbax.checkpoint as ocp
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        # Two managers, mirroring the reference's dual needs: the main one
        # keeps the newest checkpoints for auto-resume; 'best/' keeps the
        # top-1 by the monitored metric (ModelCheckpoint(save_top_k=1,
        # monitor=eval_lh/avg_seq_len, max), conf/callbacks/calvin.yaml).
        self.manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=save_top_k + 1,
                                                 create=True))
        self.best_manager = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
        # persist the best score so auto-resume doesn't overwrite the
        # historical best with the first post-restart metric
        self._best_file = os.path.join(self.ckpt_dir, "best_score.json")
        self._best = -np.inf if mode == "max" else np.inf
        if os.path.exists(self._best_file):
            with open(self._best_file) as f:
                self._best = float(json.load(f)["best"])

    def save(self, step: int, state: TrainState,
             metrics: Optional[Dict[str, float]] = None):
        import orbax.checkpoint as ocp
        clean = {k: float(v) for k, v in (metrics or {}).items()
                 if np.ndim(v) == 0}
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()
        if clean and self.monitor in clean:
            val = clean[self.monitor]
            better = val > self._best if self.mode == "max" else val < self._best
            if better:
                self._best = val
                self.best_manager.save(step, args=ocp.args.StandardSave(state))
                self.best_manager.wait_until_finished()
                with open(self._best_file, "w") as f:
                    json.dump({"best": val, "step": step,
                               "monitor": self.monitor}, f)
        return True

    def best_step(self) -> Optional[int]:
        return self.best_manager.latest_step()

    def restore_best(self, state: TrainState) -> TrainState:
        import orbax.checkpoint as ocp
        step = self.best_manager.latest_step()
        if step is None:
            return self.restore(state)
        return self.best_manager.restore(step,
                                         args=ocp.args.StandardRestore(state))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        import orbax.checkpoint as ocp
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state
        return self.manager.restore(step, args=ocp.args.StandardRestore(state))


class Trainer:
    """Epoch-driven training with in-loop validation and rollout hooks,
    mirroring the reference recipe (conf/config_calvin.yaml:22-44: bf16,
    limit_train_batches 1000, limit_val_batches 4, max_epochs 20,
    rollout_freq 5)."""

    def __init__(self, agent: MoDEAgent, *, log_dir: str = "runs/default",
                 max_epochs: int = 20, limit_train_batches: int = 1000,
                 limit_val_batches: int = 4, rollout_freq: int = 5,
                 optimizer_kwargs: Optional[dict] = None,
                 ema_kwargs: Optional[dict] = None,
                 checkpoint_kwargs: Optional[dict] = None,
                 use_wandb: bool = False, mesh=None,
                 rollout_callback: Optional[Callable] = None,
                 preprocess_fn: Optional[Callable] = None,
                 monitor: str = "eval_lh/avg_seq_len",
                 auto_layout: bool = False,
                 bf16_full_state: bool = False):
        self.agent = agent
        self.max_epochs = max_epochs
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.rollout_freq = rollout_freq
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = MetricLogger(log_dir, use_wandb=use_wandb)
        ckpt_kwargs = dict(checkpoint_kwargs or {})
        ckpt_kwargs.setdefault("monitor", monitor)
        self.ckpt = CheckpointManager(os.path.join(log_dir, "saved_models"),
                                      **ckpt_kwargs)
        self.rollout_callback = rollout_callback
        self.preprocess_fn = preprocess_fn
        self.optimizer_kwargs = optimizer_kwargs or {}
        self.ema_kwargs = ema_kwargs or {}
        # trainer.auto_layout: let XLA choose the parameter/optimizer-state
        # layouts for the train step (kills the per-step expert-weight
        # transpose copies, docs/PERF.md "train step"). Compiled lazily on
        # the first batch; checkpoints are unaffected (orbax round-trips
        # through host row-major arrays).
        self.auto_layout = auto_layout
        # trainer.bf16_full_state: params/grads/Adam moments/EMA all stored
        # bf16 (18 B/param on the HBM-bound update pass vs 28 with the f32
        # master copy); parameter write-back uses stochastic rounding so
        # sub-ulp updates accumulate in expectation (optim.py). Convergence-
        # gated opt-in, like the reference has no analog for.
        self.bf16_full_state = bf16_full_state
        self._optimizer = None
        self._train_step = None
        self._step_fn = None
        self._auto_steps = {}   # auto_layout: AOT variants per batch shape
        self._batch_shardings = None
        self.resumed = False

    def setup(self, rng=None, image_hw=(224, 224)) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.agent.cfg.seed)
        k_init, k_state = jax.random.split(rng)
        variables = self.agent.init_variables(k_init, image_hw=image_hw)
        opt_kwargs = dict(self.optimizer_kwargs)
        state_dtypes = {}
        if self.bf16_full_state:
            opt_kwargs.setdefault("stochastic_round", True)
            # SR noise source: the hw RNG generates the noise in a separate
            # cheap pass (~4 ms/step flagship) and leaves the fused update
            # single-pass; INLINED threefry noise splits the 518 update
            # fusions into extra HBM passes (+9 ms measured, device traces
            # tt_r4/tt_r4c — docs/PERF.md "train step")
            opt_kwargs.setdefault("sr_noise", "hw")
            state_dtypes = dict(param_dtype=jnp.bfloat16,
                                ema_dtype=jnp.bfloat16)
        self._optimizer, self._schedule = make_optimizer(
            variables["params"], **opt_kwargs)
        state = TrainState.create(variables, self._optimizer, k_state,
                                  **state_dtypes)

        step_fn = make_train_step(self.agent, self._optimizer,
                                  ema_kwargs=self.ema_kwargs,
                                  preprocess_fn=self.preprocess_fn)
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        self._batch_shardings = jax.tree.map(lambda _: bsh, {
            "rgb_static": 0, "rgb_gripper": 0, "actions": 0,
            "lang_emb": 0})
        if self.auto_layout:
            # defer to the first fit() batch: AUTO-layout AOT compilation
            # needs concrete batch shapes (jit_auto_layout docstring)
            self._step_fn = step_fn
            self._train_step = None
            self._auto_steps = {}
        else:
            self._train_step = jax.jit(
                step_fn,
                in_shardings=(rep, self._batch_shardings),
                out_shardings=(rep, rep),
                donate_argnums=(0,))

        # validation denoise compiled ONCE and reused across epochs (the
        # round-1 un-jitted path retraced the 10-step sampler every epoch)
        def val_fn(variables, batch, rng):
            _, metrics = self.agent.validation_denoise(variables, batch, rng)
            return metrics

        self._val_step = jax.jit(
            val_fn,
            in_shardings=(rep, jax.tree.map(lambda _: bsh, {
                "rgb_static": 0, "rgb_gripper": 0, "actions": 0,
                "lang_emb": 0}), rep),
            out_shardings=rep)

        # auto-resume from newest checkpoint (training_calvin.py:77-78)
        latest = self.ckpt.latest_step()
        if latest is not None:
            logger.info("auto-resuming from checkpoint step %d", latest)
            state = self.ckpt.restore(state)
            self.resumed = True
        return jax.device_put(state, replicated(self.mesh))

    def fit(self, state: TrainState, train_iter_fn: Callable[[], Iterable],
            val_iter_fn: Optional[Callable[[], Iterable]] = None) -> TrainState:
        """train_iter_fn() -> iterable of host batches per epoch.

        Installs a graceful-preemption SIGTERM handler for the duration of
        the run (TPU pools send SIGTERM before reclaim): the in-flight batch
        finishes, a checkpoint is written at the batch boundary, and fit()
        returns — auto-resume picks the run back up. Chained so the
        shm-cache unlink handler (data/shm_cache.py) still runs; the
        previous handler is restored even if fit() raises.
        """
        import signal
        self._preempted = False
        prev_handler = signal.getsignal(signal.SIGTERM)

        def _on_sigterm(signum, frame):
            logger.warning("SIGTERM: checkpointing at the next batch "
                           "boundary, then exiting fit()")
            self._preempted = True
            if callable(prev_handler):
                try:
                    prev_handler(signum, frame)
                except SystemExit:
                    # the shm-cache handler chain (data/shm_cache.py) ends in
                    # SystemExit when its own prev was SIG_DFL; every cleanup
                    # in the chain has already run by then. Swallow it — the
                    # whole point of this handler is to defer the exit to the
                    # batch boundary so the checkpoint gets written.
                    pass

        installed = False
        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
            installed = True
        except ValueError:   # not the main thread (e.g. test harness)
            pass
        try:
            return self._fit_inner(state, train_iter_fn, val_iter_fn)
        finally:
            if installed:
                try:
                    signal.signal(signal.SIGTERM,
                                  prev_handler if prev_handler is not None
                                  else signal.SIG_DFL)
                except (ValueError, TypeError):
                    pass

    def _fit_inner(self, state: TrainState, train_iter_fn, val_iter_fn):
        import inspect

        def _call_iter(fn, epoch):
            try:
                if len(inspect.signature(fn).parameters) >= 1:
                    return fn(epoch)
            except (TypeError, ValueError):
                pass
            return fn()

        start_epoch = int(jax.device_get(state.epoch))
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            n = 0
            expert_counts = None
            for batch in _call_iter(train_iter_fn, epoch):
                if n >= self.limit_train_batches:
                    break
                batch = shard_batch(self.mesh, batch)
                if self.auto_layout:
                    # one AOT variant per batch shape (AOT programs don't
                    # retrace, so a short final batch compiles its own);
                    # metrics stay replicated/default-layout so eager
                    # telemetry ops on them are safe on every backend
                    bkey = tuple(x.shape[0] for x in jax.tree.leaves(batch))
                    step_call = self._auto_steps.get(bkey)
                    if step_call is None:
                        from jax.experimental.layout import Format, Layout
                        rep = replicated(self.mesh)
                        # variants after the first (e.g. a short final
                        # batch) compile against the state's current
                        # layouts so it never re-lays between them
                        # (relay-fragile — see jit_auto_layout docstring)
                        prev = next(iter(self._auto_steps.values()), None)
                        step_call, state = jit_auto_layout(
                            self._step_fn, state, example_args=(batch,),
                            state_sharding=rep,
                            rest_shardings=(self._batch_shardings,),
                            out_shardings=(Format(Layout.AUTO), rep),
                            reuse_formats=(prev is not None) or None)
                        self._auto_steps[bkey] = step_call
                else:
                    step_call = self._train_step
                try:
                    state, metrics = step_call(state, batch)
                except Exception:
                    if not self.auto_layout or self._train_step is not None:
                        raise
                    # auto-layout resilience: some backends mishandle
                    # XLA-chosen layouts outside the executable that made
                    # them (relayout and even execution can raise opaque
                    # INVALID_ARGUMENT — observed on the axon relay).
                    # Relaying DEFAULT-ward is always materializable, so
                    # fall back to the plain-jit step and keep training.
                    logger.warning(
                        "auto-layout step failed on this backend; falling "
                        "back to default layouts for the rest of the run",
                        exc_info=True)
                    self.auto_layout = False
                    self._auto_steps = {}
                    state = relayout_default(state)
                    rep = replicated(self.mesh)
                    self._train_step = jax.jit(
                        self._step_fn,
                        in_shardings=(rep, self._batch_shardings),
                        out_shardings=(rep, rep),
                        donate_argnums=(0,))
                    step_call = self._train_step
                    state, metrics = step_call(state, batch)
                n += 1
                if "expert_counts" in metrics:
                    ec = metrics["expert_counts"]
                    expert_counts = ec if expert_counts is None \
                        else expert_counts + ec
                if n % 100 == 0 or n == 1:
                    host = {k: np.asarray(v) for k, v in metrics.items()
                            if not k.startswith("expert")}
                    host["train/lr"] = float(self._schedule(int(state.step)))
                    self.logger.log(host, int(state.step))
                if self._preempted:
                    break
            if self._preempted:
                self.ckpt.save(int(state.step), jax.device_get(state),
                               {"train/preempted": 1.0})
                logger.warning("preemption checkpoint saved at step %d; "
                               "auto-resume will continue this run",
                               int(state.step))
                break
            dt = time.time() - t0
            epoch_metrics = {"train/epoch_time_s": dt,
                             "train/steps_per_s": n / max(dt, 1e-9)}
            from ..utils.utils import device_memory_stats
            epoch_metrics.update(device_memory_stats())
            if expert_counts is not None:
                # per-layer normalized expert usage (the TPU analog of the
                # reference's seaborn heatmap, mode_agent.py:466-511)
                usage = np.asarray(expert_counts, np.float64)
                usage = usage / np.maximum(usage.sum(axis=1, keepdims=True), 1)
                epoch_metrics["MoE_utils/expert_usage"] = usage.round(4)

            if val_iter_fn is not None:
                val_losses = []
                for i, batch in enumerate(_call_iter(val_iter_fn, epoch)):
                    if i >= self.limit_val_batches:
                        break
                    batch = shard_batch(self.mesh, batch)
                    m = self._val_step(state.eval_variables(), batch,
                                       jax.random.PRNGKey(epoch))
                    val_losses.append(float(m["val_act/lang_act_loss_pp"]))
                if val_losses:
                    epoch_metrics["val_act/lang_act_loss_pp"] = float(
                        np.mean(val_losses))

            if (self.rollout_callback is not None
                    and (epoch + 1) % self.rollout_freq == 0):
                rollout_metrics = self.rollout_callback(
                    self.agent, state.eval_variables(), epoch)
                epoch_metrics.update(rollout_metrics)

            self.logger.log(epoch_metrics, int(state.step))
            state = state.replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32))
            self.ckpt.save(int(state.step), jax.device_get(state),
                           epoch_metrics)
            logger.info("epoch %d done in %.1fs: %s", epoch, dt, epoch_metrics)
        if self.auto_layout:
            # hand back default-layout arrays: downstream export/eval code
            # may run eager ops, which reject XLA-chosen tiled layouts on
            # some backends (see relayout_default)
            state = relayout_default(state)
        return state
