"""AOT compilation cache: serialize compiled executables to disk.

The reference pays no compile cost (eager torch); our single-jit pipelines
compile once per (shape, step-count, sampler) signature — several minutes
on a remote TPU.  The persistent XLA compilation cache already makes
repeat *processes* warm, but still pays tracing + cache lookup; this
module makes cold start explicit and portable: `dump()` an already-jitted
function's compiled executable for concrete example arguments, `load()`
it in a fresh process and run without tracing or compiling at all.

Serialized executables are topology-bound (same device kind/count and
jax version) — exactly the serving use case (same TPU, process restarts).

Pipelines integrate via :class:`AotDispatcher`: a drop-in wrapper around
the jitted generate that consults loaded executables by argument
signature and falls back to the jitted path on miss (so a pipeline with
an AOT cache behaves identically, only faster to first image).
"""

from __future__ import annotations

import json
import logging
import pickle
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np

logger = logging.getLogger("powerpaint_tpu.aot")

# Bump when a kernel/code change alters the compiled program without
# changing any argument shape or env knob (e.g. flash-attention block
# retunes) — stale serialized executables must not silently serve the old
# program.  Part of the compute-mode tag below.
KERNEL_REV = 5  # rev 5: flash attention exp2 softmax (log2e folded in q)

# v2 layout: magic line, 8-byte little-endian JSON-header length, JSON
# header (validated BEFORE any unpickling — .aot files are trusted local
# artifacts, but corrupt/mismatched ones must fail at the header, not
# inside pickle), then the pickled executable payload.
_MAGIC_LINE = b"PPTAOT2\n"
_MAGIC = "powerpaint-aot-v2"


def _leaf_sig(x: Any) -> Any:
    """Stable signature of one dynamic argument leaf."""
    if x is None:
        return None
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(np.dtype(x.dtype)))
    return ("py", repr(x))


def signature(dynamic_args: Sequence[Any], statics: Sequence[Any]) -> Tuple:
    dyn = tuple(
        tuple(_leaf_sig(leaf) for leaf in jax.tree.leaves(a, is_leaf=lambda
              l: l is None))
        for a in dynamic_args
    )
    return (dyn, tuple(repr(s) for s in statics))


def dump(jitted, path: str, *args, n_static_tail: int = 0,
         mode: str = "") -> Tuple:
    """Lower+compile ``jitted`` for ``args`` and serialize to ``path``.

    ``args`` is the FULL argument list (dynamic leading, then
    ``n_static_tail`` static trailing arguments, exactly as the function
    is invoked).  ``mode`` tags trace-time compute modes that change the
    program WITHOUT changing any argument shape (quantize/im2col/
    sequence-parallel) — load() refuses a file whose mode differs, so an
    int8 run can never silently execute a cached bf16 executable.
    Returns the stored signature.
    """
    from jax.experimental.serialize_executable import serialize

    dyn = args[: len(args) - n_static_tail] if n_static_tail else args
    statics = args[len(args) - n_static_tail:] if n_static_tail else ()
    compiled = jitted.lower(*args).compile()
    blob, in_tree, out_tree = serialize(compiled)
    sig = signature(dyn, statics)
    # device span of THIS executable (1 for plain jit, N under a mesh) —
    # deserialize_and_load defaults to every local device, which breaks
    # single-device executables on multi-device hosts.
    spans = [len(s.device_set) for s in jax.tree.leaves(compiled.input_shardings)]
    header = json.dumps({
        "magic": _MAGIC,
        "jax_version": jax.__version__,
        "platform": jax.devices()[0].platform,
        "num_devices": max(spans) if spans else 1,
        "mode": mode,
    }).encode("utf-8")
    payload = {
        "signature": sig,
        "in_tree": in_tree,
        "out_tree": out_tree,
        "blob": blob,
    }
    with open(path, "wb") as f:
        f.write(_MAGIC_LINE)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        pickle.dump(payload, f)
    return sig


def read_header(path: str) -> dict:
    """Parse + validate the JSON preamble WITHOUT unpickling anything."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC_LINE))
        if magic != _MAGIC_LINE:
            raise RuntimeError(
                f"{path}: not a powerpaint AOT v2 file (legacy v1 files "
                "must be re-dumped)"
            )
        hlen = int.from_bytes(f.read(8), "little")
        if not 0 < hlen <= 65536:
            raise RuntimeError(f"{path}: corrupt AOT header")
        header = json.loads(f.read(hlen).decode("utf-8"))
    if header.get("magic") != _MAGIC:
        raise RuntimeError(f"{path}: corrupt AOT header magic")
    return header


def load(path: str, expect_mode: Optional[str] = None):
    """Deserialize an executable; returns ``(signature, callable)``.

    The callable takes ONLY the dynamic arguments (statics were baked in
    at lowering time).  Raises ``RuntimeError`` on topology/version/mode
    mismatch — all checked against the JSON preamble BEFORE the pickled
    executable is touched.
    """
    from jax.experimental.serialize_executable import deserialize_and_load

    header = read_header(path)
    if header["jax_version"] != jax.__version__:
        raise RuntimeError(
            f"{path}: built with jax {header['jax_version']}, "
            f"running {jax.__version__}"
        )
    if (header["platform"] != jax.devices()[0].platform
            or header["num_devices"] > len(jax.devices())):
        raise RuntimeError(
            f"{path}: built for {header['num_devices']}x"
            f"{header['platform']}, running {len(jax.devices())}x"
            f"{jax.devices()[0].platform}"
        )
    if expect_mode is not None and header.get("mode", "") != expect_mode:
        raise RuntimeError(
            f"{path}: built in compute mode {header.get('mode', '')!r}, "
            f"running {expect_mode!r} — executables are mode-specific"
        )
    with open(path, "rb") as f:
        f.seek(len(_MAGIC_LINE))
        hlen = int.from_bytes(f.read(8), "little")
        f.seek(hlen, 1)
        payload = pickle.load(f)
    exe = deserialize_and_load(
        payload["blob"], payload["in_tree"], payload["out_tree"],
        execution_devices=jax.devices()[: header["num_devices"]],
    )
    return payload["signature"], exe


class AotDispatcher:
    """Wraps a jitted function; routes matching calls to loaded AOT
    executables, everything else to the jitted fallback.

    ``n_static_tail``: how many trailing positional arguments are static
    (they are baked into AOT executables and must not be passed to them).
    """

    _seq = 0  # class-wide call ordering (which dispatcher ran last)

    def __init__(self, jitted, n_static_tail: int = 0):
        self._jitted = jitted
        self._n_static = n_static_tail
        self._entries = []  # [[signature, callable, proven_once]]
        self._last_args: Optional[tuple] = None
        self._last_seq = -1

    def __call__(self, *args):
        self._last_args = args
        AotDispatcher._seq += 1
        self._last_seq = AotDispatcher._seq
        if self._entries:
            n = len(args) - self._n_static
            dyn, statics = args[:n], args[n:]
            sig = signature(dyn, statics)
            for entry in list(self._entries):
                stored, exe = entry[0], entry[1]
                if stored == sig:
                    if entry[2]:  # already proven once — stay async
                        return exe(*dyn)
                    try:
                        out = exe(*dyn)
                        # first use of this executable: force completion
                        # HERE so a corrupt file surfaces as this try's
                        # error, not as a crash at the caller's fetch
                        out = jax.block_until_ready(out)
                        entry[2] = True
                        return out
                    except Exception as e:
                        # a serialized executable can be subtly broken
                        # (e.g. XLA:CPU cannot re-serialize an executable
                        # it restored from the persistent compile cache:
                        # "Buffer Definition Event: ... not found").
                        # Drop it and recompile via jit — loudly, because
                        # the fallback is a multi-minute compile the
                        # operator thought the AOT cache had eliminated.
                        logger.warning(
                            "dropping AOT executable (sig=%s): first "
                            "execution failed with %s: %s — falling back "
                            "to jit compilation", stored, type(e).__name__,
                            e,
                        )
                        self._entries.remove(entry)
        return self._jitted(*args)

    # pass-through so .lower() etc. keep working on the wrapped function
    def __getattr__(self, name):
        return getattr(self._jitted, name)

    def dump(self, path: str, *args, mode: str = "") -> Tuple:
        return dump(self._jitted, path, *args,
                    n_static_tail=self._n_static, mode=mode)

    def dump_last(self, path: str, mode: str = "") -> Tuple:
        """Serialize the executable for the most recent call's signature
        (make one warmup call first — it defines the shapes/statics)."""
        if self._last_args is None:
            raise RuntimeError(
                "no call recorded yet — invoke the pipeline once with the "
                "production shapes, then dump"
            )
        return self.dump(path, *self._last_args, mode=mode)

    def load(self, path: str) -> Tuple:
        sig, exe = load(path)
        self._entries.append([sig, exe, False])
        return sig


class AotPipelineMixin:
    """Pipeline-facing AOT surface; expects the pipeline's jitted generate
    functions (``_generate`` and/or ``_generate_cn``) to be wrapped in
    :class:`AotDispatcher`."""

    def _aot_dispatchers(self):
        return [
            d for d in (getattr(self, n, None)
                        for n in ("_generate", "_generate_cn"))
            if isinstance(d, AotDispatcher)
        ]

    def _aot_mode(self) -> str:
        """Trace-time compute-mode tag baked into dumped executables and
        enforced at load.  Captures every knob that changes the compiled
        program without changing any argument shape/dtype (an int8 or
        im2col run must never execute a cached bf16 executable)."""
        import os

        # int8 appended ONLY when on: default runs keep the legacy mode
        # string, so executables dumped before the int8 knob existed stay
        # loadable (an int8 run still can never serve a cached bf16 file)
        int8 = os.environ.get("POWERPAINT_INT8", "0")
        return (
            f"quant={getattr(self, 'quantize', None)}"
            f",im2col={os.environ.get('POWERPAINT_CONV_IM2COL', '0')}"
            f",sp={getattr(self, 'sequence_parallel', False)}"
            f",fusednorms={os.environ.get('POWERPAINT_FUSED_NORMS', '0')}"
            + (f",int8={int8}" if int8 != "0" else "")
            + f",rev={KERNEL_REV}"
        )

    def aot_dump(self, path: str, validate: bool = True):
        """Serialize the compiled generate executable for the most recent
        call's shapes/statics.  Warm up with one production call, dump
        once; a fresh process then ``aot_load``s and serves its first
        image without tracing or compiling.

        ``validate`` re-loads the file and executes it once, comparing
        against the jit result (host fetch as the fence).  This catches a
        real hazard: XLA cannot always re-serialize an executable it
        restored from the persistent compilation cache — the file loads
        but crashes at run time ("Buffer Definition Event ... not
        found").  A bad file is deleted and RuntimeError raised.
        """
        import os

        ds = [d for d in self._aot_dispatchers() if d._last_args is not None]
        if not ds:
            raise RuntimeError("call the pipeline once before aot_dump")
        d = max(ds, key=lambda dd: dd._last_seq)
        sig = d.dump_last(path, mode=self._aot_mode())
        if validate:
            import numpy as np

            n = len(d._last_args) - d._n_static
            dyn = d._last_args[:n]
            try:
                _, exe = load(path)
                got = np.asarray(jax.tree.leaves(exe(*dyn))[0])
                want = np.asarray(jax.tree.leaves(d(*d._last_args))[0])
                if not np.array_equal(got, want):
                    raise RuntimeError("AOT output mismatch")
            except Exception as e:
                try:
                    os.remove(path)
                except OSError:
                    pass
                raise RuntimeError(
                    f"aot_dump validation failed ({e}); this usually means "
                    "the executable was restored from the persistent "
                    "compilation cache, which XLA cannot re-serialize — "
                    "dump from a freshly-compiled process instead"
                ) from e
        return sig

    def aot_load(self, path: str):
        """Load a serialized executable; calls with matching shapes and
        statics skip compilation entirely (mismatches fall back to jit).
        Refuses files dumped under a different compute mode."""
        sig, exe = load(path, expect_mode=self._aot_mode())
        for d in self._aot_dispatchers():
            d._entries.append([sig, exe, False])
        return sig

    def aot_proven(self, sig) -> bool:
        """True once the loaded executable with this signature (the value
        ``aot_load`` returned) has actually served a call.  False after a
        warmup call that silently fell back to jit — the file on disk no
        longer matches the call's shapes/statics and the caller should
        drop it and re-dump from the freshly-compiled program, or every
        future process pays the load PLUS the multi-minute compile."""
        return any(
            e[2]
            for d in self._aot_dispatchers()
            for e in d._entries
            if e[0] == sig
        )

    def aot_drop(self, sig) -> None:
        """Forget a loaded executable (pair with deleting its file)."""
        for d in self._aot_dispatchers():
            d._entries[:] = [e for e in d._entries if e[0] != sig]

    def aot_repair_stale(self, sig, path: str, warm: bool) -> bool:
        """After a warmup call: detect the SILENT-miss case where
        ``aot_load`` succeeded but the call's signature no longer matched,
        so the dispatcher quietly fell back to a fresh (multi-minute) jit
        compile.  Drops the dead in-memory entry and returns False so the
        caller re-dumps via :meth:`aot_redump` — which only replaces the
        on-disk file once the new dump is known good, so a failed
        re-serialization never leaves the cache entry deleted.  Returns
        ``warm`` unchanged when the executable actually served (or none
        was loaded)."""
        if warm and sig is not None and not self.aot_proven(sig):
            logger.warning(
                "AOT executable %s loaded but did not match the warmup "
                "call's signature — the warmup paid a fresh compile; "
                "re-dump it (aot_redump) so future runs ride the cache",
                path,
            )
            self.aot_drop(sig)
            return False
        return warm

    def aot_redump(self, path: str) -> bool:
        """Serialize the most recent call's executable to ``path`` safely:
        dump+validate into a temp file and atomically replace only on
        success.  A failed re-serialization (common when the warmup's
        "compile" was actually a persistent-cache restore, which XLA
        cannot re-serialize) keeps whatever file was there and warns
        loudly instead of silently losing the cache entry.  Returns True
        when ``path`` now holds a validated executable."""
        import os

        tmp = path + ".tmp"
        try:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            self.aot_dump(tmp)
            os.replace(tmp, path)
            return True
        except Exception as e:
            logger.warning(
                "aot re-dump to %s failed: %s: %s — keeping the previous "
                "file; dump from a freshly-compiled process "
                "(scripts/warm_aot.sh) to repair it",
                path, type(e).__name__, e,
            )
            try:
                os.remove(tmp)
            except OSError:
                pass
            return False
