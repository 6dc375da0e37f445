import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (SURVEY.md §4 implication (d)).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon environment's sitecustomize (/root/.axon_site) force-resets
# jax_platforms to "axon,cpu"; override it back to CPU-only for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


_ref_convert = None


def reference_convert():
    """Import the reference converter module (as a black-box oracle for
    golden tests; never vendored)."""
    global _ref_convert
    if _ref_convert is not None:
        return _ref_convert
    import importlib.util
    import types

    # convert.py imports sentencepiece at module level; stub it (we only use
    # the quantizers and file writer, not SentencePieceProcessor).
    if "sentencepiece" not in sys.modules:
        sp = types.ModuleType("sentencepiece")
        sp.SentencePieceProcessor = object
        sys.modules["sentencepiece"] = sp
    for mod, attr in [("tabulate", "tabulate"), ("tqdm", "tqdm")]:
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                m = types.ModuleType(mod)
                if attr == "tabulate":
                    m.tabulate = lambda *a, **k: ""
                else:
                    m.tqdm = lambda x, **k: x
                sys.modules[mod] = m
    spec = importlib.util.spec_from_file_location(
        "ref_convert", os.path.join(REFERENCE_DIR, "convert.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    _ref_convert = m
    return m
