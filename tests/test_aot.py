"""AOT executable serialization (io/aot.py): cold-start without compile.

No reference counterpart (torch is eager); this is the TPU-native answer
to serving cold start — serialize the compiled generate executable, load
it in a fresh process, first image runs without tracing or compiling.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from powerpaint_tpu.io.aot import AotDispatcher, dump, load


def _f(x, w, b, scale, flag):
    y = jnp.tanh(x @ w) * scale
    if b is not None:
        y = y + b
    return y * (2.0 if flag else 1.0)


def test_dump_load_roundtrip(tmp_path):
    disp = AotDispatcher(jax.jit(_f, static_argnames=("flag",)),
                         n_static_tail=1)
    x = jnp.ones((64, 32))
    w = jnp.ones((32, 16))
    scale = jnp.float32(0.5)
    ref = np.asarray(disp(x, w, None, scale, True))
    path = str(tmp_path / "f.aot")
    disp.dump_last(path)

    # fresh dispatcher: load and execute without ever tracing
    def boom(*a, **k):
        raise AssertionError("jit fallback used despite AOT hit")

    disp2 = AotDispatcher(boom, n_static_tail=1)
    disp2.load(path)
    out = np.asarray(disp2(x, w, None, scale, True))
    np.testing.assert_array_equal(ref, out)


def test_signature_miss_falls_back(tmp_path):
    jitted = jax.jit(_f, static_argnames=("flag",))
    disp = AotDispatcher(jitted, n_static_tail=1)
    x = jnp.ones((64, 32))
    w = jnp.ones((32, 16))
    scale = jnp.float32(0.5)
    disp(x, w, None, scale, True)
    path = str(tmp_path / "f.aot")
    disp.dump_last(path)
    disp.load(path)
    # different shape -> fallback to jit, still correct
    x2 = jnp.ones((8, 32))
    out = np.asarray(disp(x2, w, None, scale, True))
    np.testing.assert_allclose(
        out, np.asarray(jitted(x2, w, None, scale, True))
    )
    # different STATIC -> must also miss (statics are baked into the exe)
    out3 = np.asarray(disp(x, w, None, scale, False))
    np.testing.assert_allclose(
        out3, np.asarray(jitted(x, w, None, scale, False))
    )


def test_v2_pipeline_aot_roundtrip(tmp_path):
    """BrushNet pipeline exposes the same aot_dump/aot_load surface."""
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.testing import tiny_v2_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0

    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = pipe(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    path = str(tmp_path / "v2.aot")
    try:
        pipe.aot_dump(path)
    except RuntimeError as e:
        import os

        assert "persistent" in str(e), e
        assert not os.path.exists(path)
        return
    pipe2 = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)
    pipe2.aot_load(path)
    pipe2._generate._jitted = None
    out = pipe2(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    np.testing.assert_array_equal(ref, out)


def test_proven_and_drop_detect_silent_miss(tmp_path):
    """aot_proven/aot_drop power the stale-executable repair
    (AotPipelineMixin.aot_repair_stale): a loaded executable whose signature
    never matches any call falls back to jit SILENTLY — no exception, just a
    hidden multi-minute compile — so the only way to notice is that the
    entry never got proven.  Detect it, drop it."""
    from powerpaint_tpu.io.aot import AotPipelineMixin

    class P(AotPipelineMixin):
        quantize = None
        sequence_parallel = False

        def __init__(self, jitted):
            self._generate = AotDispatcher(jitted, n_static_tail=1)

    jitted = jax.jit(_f, static_argnames=("flag",))
    x = jnp.ones((64, 32))
    w = jnp.ones((32, 16))
    scale = jnp.float32(0.5)
    p = P(jitted)
    p._generate(x, w, None, scale, True)
    path = str(tmp_path / "p.aot")
    p._generate.dump_last(path, mode=p._aot_mode())

    # matching call: entry serves and becomes proven
    p2 = P(jitted)
    sig = p2.aot_load(path)
    assert not p2.aot_proven(sig)  # loaded but not served yet
    p2._generate(x, w, None, scale, True)
    assert p2.aot_proven(sig)

    # mismatching call (different shape): silent jit fallback — the
    # entry stays unproven, and aot_drop removes it
    p3 = P(jitted)
    sig3 = p3.aot_load(path)
    p3._generate(jnp.ones((8, 32)), w, None, scale, True)
    assert not p3.aot_proven(sig3)
    p3.aot_drop(sig3)
    assert not p3._generate._entries


def test_repair_stale_and_redump(tmp_path):
    """aot_repair_stale drops the dead in-memory entry but leaves the file
    on disk; aot_redump writes the replacement via a temp file and only
    swaps it in once validated (ADVICE round 4: a failed re-serialization
    must never leave the cache entry deleted)."""
    from powerpaint_tpu.io.aot import AotPipelineMixin

    class P(AotPipelineMixin):
        quantize = None
        sequence_parallel = False

        def __init__(self, jitted):
            self._generate = AotDispatcher(jitted, n_static_tail=1)

    jitted = jax.jit(_f, static_argnames=("flag",))
    x = jnp.ones((64, 32))
    w = jnp.ones((32, 16))
    scale = jnp.float32(0.5)
    p = P(jitted)
    p._generate(x, w, None, scale, True)
    path = str(tmp_path / "p.aot")
    p._generate.dump_last(path, mode=p._aot_mode())
    with open(path, "rb") as f:
        before = f.read()

    # warmup with a DIFFERENT shape: silent jit fallback -> repair returns
    # False and drops the entry, but the on-disk file is untouched
    p2 = P(jitted)
    sig = p2.aot_load(path)
    p2._generate(jnp.ones((8, 32)), w, None, scale, True)
    assert p2.aot_repair_stale(sig, path, True) is False
    assert not p2._generate._entries
    with open(path, "rb") as f:
        assert f.read() == before  # NOT deleted before a good replacement

    # a matching warmup leaves everything alone (warm stays True)
    p4 = P(jitted)
    sig4 = p4.aot_load(path)
    p4._generate(x, w, None, scale, True)
    assert p4.aot_repair_stale(sig4, path, True) is True

    # redump atomically replaces the file with the new program; the new
    # file loads and serves the new shape without jit
    assert p2.aot_redump(path)
    assert not os.path.exists(path + ".tmp")
    p3 = P(jitted)
    sig3 = p3.aot_load(path)
    p3._generate(jnp.ones((8, 32)), w, None, scale, True)
    assert p3.aot_proven(sig3)


def test_redump_failure_keeps_old_file(tmp_path, monkeypatch):
    """When the dump itself fails (XLA cannot re-serialize a persistent-
    cache-restored executable), aot_redump returns False, cleans its temp
    file, and the previous file survives."""
    from powerpaint_tpu.io import aot as aot_mod
    from powerpaint_tpu.io.aot import AotPipelineMixin

    class P(AotPipelineMixin):
        quantize = None
        sequence_parallel = False

        def __init__(self, jitted):
            self._generate = AotDispatcher(jitted, n_static_tail=1)

    jitted = jax.jit(_f, static_argnames=("flag",))
    x = jnp.ones((64, 32))
    w = jnp.ones((32, 16))
    scale = jnp.float32(0.5)
    p = P(jitted)
    p._generate(x, w, None, scale, True)
    path = str(tmp_path / "p.aot")
    p._generate.dump_last(path, mode=p._aot_mode())
    with open(path, "rb") as f:
        before = f.read()

    def boom(*a, **k):
        raise RuntimeError("Buffer Definition Event: not found")

    monkeypatch.setattr(P, "aot_dump", boom)
    assert p.aot_redump(path) is False
    assert not os.path.exists(path + ".tmp")
    with open(path, "rb") as f:
        assert f.read() == before


def test_broken_executable_falls_back_to_jit():
    """A loaded executable that crashes at run time (e.g. XLA re-serialized
    a persistent-cache-restored executable) is dropped and the call
    recompiles via jit instead of failing."""
    jitted = jax.jit(lambda x: x * 2.0)
    disp = AotDispatcher(jitted, n_static_tail=0)
    x = jnp.ones((8, 8))
    ref = np.asarray(jitted(x))

    def boom(*a):
        raise RuntimeError("Buffer Definition Event: not found")

    from powerpaint_tpu.io.aot import signature

    disp._entries.append([signature((x,), ()), boom, False])
    out = np.asarray(disp(x))
    np.testing.assert_array_equal(out, ref)
    assert not disp._entries  # bad entry dropped


def test_version_guard(tmp_path):
    """Header checks happen BEFORE any unpickling (ADVICE round 2): the
    JSON preamble carries version/platform/mode; tampering with it fails
    fast and a truncated/garbage file fails at the magic, not in pickle."""
    import json

    from powerpaint_tpu.io.aot import _MAGIC_LINE, read_header

    jitted = jax.jit(lambda x: x + 1)
    path = str(tmp_path / "v.aot")
    dump(jitted, path, jnp.ones((4,)))

    with open(path, "rb") as f:
        raw = f.read()
    hlen = int.from_bytes(raw[len(_MAGIC_LINE):len(_MAGIC_LINE) + 8],
                          "little")
    header = json.loads(raw[len(_MAGIC_LINE) + 8:len(_MAGIC_LINE) + 8 + hlen])
    header["jax_version"] = "0.0.0"
    blob = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC_LINE)
        f.write(len(blob).to_bytes(8, "little"))
        f.write(blob)
        f.write(raw[len(_MAGIC_LINE) + 8 + hlen:])
    with pytest.raises(RuntimeError, match="built with jax"):
        load(path)

    # not-an-aot-file rejected at the magic line, never unpickled
    bad = str(tmp_path / "bad.aot")
    with open(bad, "wb") as f:
        f.write(b"garbage not a pickle")
    with pytest.raises(RuntimeError, match="not a powerpaint AOT"):
        read_header(bad)


def test_mode_guard(tmp_path):
    """A file dumped under one compute mode refuses to load under another
    (the int8-executes-cached-bf16 hazard, ADVICE round 2)."""
    jitted = jax.jit(lambda x: x * 2)
    path = str(tmp_path / "m.aot")
    dump(jitted, path, jnp.ones((4,)), mode="quant=None,im2col=0,sp=False")
    sig, exe = load(path, expect_mode="quant=None,im2col=0,sp=False")
    assert exe is not None
    with pytest.raises(RuntimeError, match="compute mode"):
        load(path, expect_mode="quant=int8,im2col=0,sp=False")


def test_kernel_rev_guard(tmp_path, monkeypatch):
    """A kernel-revision bump (a code change that alters compiled programs
    without changing any signature or env knob, e.g. a flash-attention
    block retune) must invalidate previously dumped executables."""
    from powerpaint_tpu.io import aot as aot_mod
    from powerpaint_tpu.io.aot import AotPipelineMixin

    class P(AotPipelineMixin):
        quantize = None
        sequence_parallel = False

    old_mode = P()._aot_mode()
    assert f"rev={aot_mod.KERNEL_REV}" in old_mode
    jitted = jax.jit(lambda x: x * 2)
    path = str(tmp_path / "r.aot")
    dump(jitted, path, jnp.ones((4,)), mode=old_mode)

    monkeypatch.setattr(aot_mod, "KERNEL_REV", aot_mod.KERNEL_REV + 1)
    with pytest.raises(RuntimeError, match="compute mode"):
        load(path, expect_mode=P()._aot_mode())


def test_pipeline_aot_roundtrip(tmp_path):
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0

    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = pipe(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    path = str(tmp_path / "v1.aot")
    try:
        pipe.aot_dump(path)  # validates the file by re-loading + executing
    except RuntimeError as e:
        # known XLA limitation, detected by the validation pass: an
        # executable restored from the persistent compilation cache
        # (warm test cache) cannot be re-serialized; the bad file must
        # have been deleted and the error must say why
        import os

        assert "persistent" in str(e), e
        assert not os.path.exists(path)
        return

    # fresh pipeline (fresh process stand-in): load, then the same call
    # must hit the AOT executable, not the jit path
    pipe2 = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    pipe2.aot_load(path)
    assert pipe2._generate._entries
    pipe2._generate._jitted = None  # any jit fallback would now crash
    out = pipe2(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    np.testing.assert_array_equal(ref, out)


def test_bench_s10_path_splice():
    """bench._s10_path must splice the suffix, never str.replace: the
    '.aot/' cache DIRECTORY component also matches '.aot', and a replace
    rewrote it too — bench then looked for the slope executable in a
    nonexistent '_s10.aot/' dir for a full round while the real file sat
    in '.aot/' (the BENCH_r04 compile_s=234 regression)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _s10_path

    assert _s10_path("/root/repo/.aot/ppt_v1_512_b1.aot") == (
        "/root/repo/.aot/ppt_v1_512_b1_s10.aot")
    assert _s10_path(".aot/ppt_cn_512_b1.aot") == (
        ".aot/ppt_cn_512_b1_s10.aot")
