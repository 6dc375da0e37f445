"""CLI flag auto-diff vs the reference's main.cpp (round-5 VERDICT #8).

Extracts every option spelling the reference parser handles
(/root/reference/src/main.cpp `handle_param`/`handle_para0`/
`is_same_command_option` sites) and asserts our parse_args recognizes each
one — so the flag set can never silently drift (same pattern as the
converter dispatch-name test, tests/test_convert_wave8.py)."""
import io
import contextlib
import pathlib
import re

import pytest

import conftest  # noqa: F401

from chatllm_tpu.main import parse_args

REF = pathlib.Path("/root/reference/src/main.cpp")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference source not available")

# structural / shell tokens, not options
_NON_FLAGS = {"--", "+", "-?"}


def reference_flags() -> list[str]:
    text = REF.read_text()
    flags = set()
    for m in re.finditer(r'is_same_command_option\(arg,\s*"([^"]+)"', text):
        flags.add(m.group(1))
    for m in re.finditer(
            r'handle_(?:param|para0|flag)\("(--[^"]+)"(?:,\s*"(-[^"]+)")?',
            text):
        flags.add(m.group(1))
        if m.group(2):
            flags.add(m.group(2))
    return sorted(flags - _NON_FLAGS)


def _accepts(flag: str) -> bool:
    """True iff parse_args recognizes `flag` (no 'unknown option' warning).
    Value errors / missing files mean the flag WAS recognized."""
    for argv in ([flag], [flag, "1"], [flag, "1", "1"]):
        err = io.StringIO()
        try:
            with contextlib.redirect_stderr(err):
                parse_args(argv)
        except SystemExit:
            if f"unknown option {flag}" in err.getvalue():
                return False
            continue        # help text / missing value -> retry with value
        except Exception:
            return True     # recognized, value unusable in the test env
        return f"unknown option {flag}" not in err.getvalue()
    return True             # every attempt exited without the warning


def test_all_reference_main_flags_accepted():
    flags = reference_flags()
    assert len(flags) >= 60, f"extractor regressed: only {len(flags)} flags"
    missing = [f for f in flags if not _accepts(f)]
    assert not missing, f"reference flags not handled: {missing}"


def test_round5_tail_flags_wired():
    """The four round-4 gaps parse into the right Args fields."""
    a = parse_args(["--set_vs_name", "docs", "--vector_store", "a.vsdb",
                    "--set_vs_name", "web", "--vector_store", "b.vsdb",
                    "--rag_post_extending", "3",
                    "--emb_rank_query_sep", "|||"])
    assert a.vector_stores == {"docs": ["a.vsdb"], "web": ["b.vsdb"]}
    assert a.rag_post_extending == 3
    assert a.emb_rank_query_sep == "|||"

    a = parse_args(["--kv", "char_name", "Alice", "user_name", "Bob"])
    assert a.additional["char_name"] == "Alice"
    assert a.additional["user_name"] == "Bob"
