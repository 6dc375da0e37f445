"""ChatLLM embedding-API tests (the libchatllm-equivalent surface)."""
import numpy as np
import pytest

import conftest  # noqa: F401

from test_model_forward import make_tiny_qwen2


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("api") / "tiny.bin")
    make_tiny_qwen2(p)
    return p


def test_chatllm_lifecycle(model_path):
    from chatllm_tpu.api import ChatLLM

    chunks = []
    llm = ChatLLM("-m", model_path, "--sampling", "greedy",
                  "--max_new_tokens", "6")
    llm.on_print = chunks.append
    llm.start()
    reply = llm.chat("hello")
    assert "".join(chunks) == reply
    assert llm.get_cursor() > 0
    ids = llm.text_tokenize("hello")
    assert isinstance(ids, list) and ids
    stats = llm.show_statistics()
    assert "eval time" in stats

    # restart clears history
    llm.restart()
    assert len(llm.pipeline.history) == 0


def test_chatllm_async(model_path):
    from chatllm_tpu.api import ChatLLM

    done = []
    llm = ChatLLM("-m", model_path, "--sampling", "greedy",
                  "--max_new_tokens", "4").start()
    llm.on_end = lambda: done.append(True)
    llm.async_chat("hi")
    llm.wait()
    assert done


def test_ppl_harness(model_path):
    from chatllm_tpu.api import ChatLLM
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.ppl import perplexity_from_ids

    model = load_model(model_path, RuntimeConfig(
        weight_dtype="float32", compute_dtype="float32", cache_dtype="float32"))
    ids = list(np.random.default_rng(0).integers(0, 255, 100))
    r = perplexity_from_ids(model, [int(i) for i in ids], ctx=33)
    assert r["tokens"] > 50
    assert r["ppl"] > 1.0
    # random weights → ppl should be near vocab size order
    assert r["ppl"] < 1e5


def test_re_quantize_and_lens(model_path):
    import numpy as np

    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.tools.lens import format_lens, lens_logits

    m_fp = load_model(model_path, RuntimeConfig(
        weight_dtype="float32", compute_dtype="float32", cache_dtype="float32"))
    m_q8 = load_model(model_path, RuntimeConfig(
        weight_dtype="float32", compute_dtype="float32", cache_dtype="float32",
        re_quantize="q8_0"))
    ids = np.array([[3, 17, 42, 99]], np.int32)
    a, _ = m_fp.forward_logits(ids)
    b, _ = m_q8.forward_logits(ids)
    rel = np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(np.asarray(a))
    assert 0 < rel < 0.1   # requantized, close but not identical

    r = lens_logits(m_fp, [3, 17, 42, 99], top_k=4)
    assert r["logits"].shape[0] == m_fp.cfg.num_hidden_layers + 1
    txt = format_lens(m_fp, r)
    assert "final" in txt


def test_tool_registry_and_detection():
    from chatllm_tpu.tools.toolcall import (ToolRegistry, detect_tool_call,
                                            qwen_system_prompt)

    reg = ToolRegistry()

    @reg.register(description="Get current weather")
    def get_weather(city: str, unit: str = "c"):
        return {"city": city, "temp": 21}

    schemas = reg.schemas()
    assert schemas[0]["name"] == "get_weather"
    assert "city" in schemas[0]["parameters"]["properties"]
    assert schemas[0]["parameters"]["required"] == ["city"]

    prompt = qwen_system_prompt(schemas)
    assert "<tools>" in prompt and "get_weather" in prompt

    call = detect_tool_call(
        'blah <tool_call>\n{"name": "get_weather", "arguments": '
        '{"city": "Paris"}}\n</tool_call>')
    assert call == ("get_weather", {"city": "Paris"})
    assert json.loads(reg.call(*call))["temp"] == 21

    call2 = detect_tool_call('{"name": "get_weather", "parameters": {"city": "Oslo"}}')
    assert call2 == ("get_weather", {"city": "Oslo"})
    assert detect_tool_call("just a normal reply") is None


import json  # noqa: E402


def test_model_downloader_resolution(tmp_path, monkeypatch):
    """`:id:variant:quant` parsing + arg rewriting (no network: pre-place the
    file at the expected size)."""
    from chatllm_tpu.tools import model_downloader as md

    catalog = {
        "tiny": {
            "brief": "t", "license": "l", "default": "1b",
            "variants": {
                "1b": {"default": "q4", "quantized": {
                    "q4": {"size": 4, "url": "proj/tiny-1b.bin"}}},
            },
        },
    }
    info = md.parse_model_id("tiny", catalog)
    assert info["fn"] == "tiny-1b.bin" and "modelscope" in info["url"]
    info = md.parse_model_id("tiny:1b:q4", catalog)
    assert info["size"] == 4

    with pytest.raises(ValueError, match="Did you mean `tiny`"):
        md.parse_model_id("tinyy", catalog)

    # cached file of the right size short-circuits the download
    (tmp_path / "tiny-1b.bin").write_bytes(b"abcd")
    fn = md.get_model("tiny", str(tmp_path), catalog)
    assert fn.endswith("tiny-1b.bin")

    monkeypatch.setenv("CHATLLM_TPU_MODELS_JSON", "")
    monkeypatch.setattr(md, "load_catalog", lambda: catalog)
    out = md.preprocess_args(["-m", ":tiny", "-i"], str(tmp_path))
    assert out[1].endswith("tiny-1b.bin")


def test_tool_family_prompts_and_detectors():
    """Round-2 family breadth (reference scripts/tool_*.py): prompt builders
    emit the family's format markers; family detectors parse the family's
    reply shapes."""
    from chatllm_tpu.tools.toolcall import (
        FAMILY_PROMPTS, FAMILY_DETECT, ToolRegistry, mistral_tool_prefix,
        _detect_glm_block_call, _detect_plugin_call, _detect_pythonic_call,
        _detect_json_array_call)

    reg = ToolRegistry()

    @reg.register(description="Get current weather")
    def get_weather(city: str, unit: str = "c"):
        return {"t": 20}

    schemas = reg.schemas()
    # every family builds a prompt mentioning the tool
    for fam, fn in FAMILY_PROMPTS.items():
        p = fn(schemas)
        assert "get_weather" in p, fam
    assert "[AVAILABLE_TOOLS]" in mistral_tool_prefix(schemas)
    # marker spot-checks
    assert "### Name" in FAMILY_PROMPTS["codegeex4"](schemas)
    assert "DeepSeek Coder" in FAMILY_PROMPTS["deepseekcoder"](schemas)
    assert "func_name1(params_name1" in FAMILY_PROMPTS["watt"](schemas)
    assert "<tools>" in FAMILY_PROMPTS["groq"](schemas)
    assert "params" in FAMILY_PROMPTS["glm3"](schemas)

    # glm3: tool_name + ```python tool_call(...)```
    assert _detect_glm_block_call(
        'get_weather\n```python\ntool_call(city="Paris", unit="f")\n```'
    ) == ("get_weather", {"city": "Paris", "unit": "f"})
    # deepseekcoder: tool_name + ```json {...}```
    assert _detect_glm_block_call(
        'get_weather\n```json\n{"city": "Oslo"}\n```'
    ) == ("get_weather", {"city": "Oslo"})
    # internlm: <|plugin|>{json}
    assert _detect_plugin_call(
        '<|plugin|>{"name": "get_weather", "parameters": {"city": "Rome"}}'
    ) == ("get_weather", {"city": "Rome"})
    # watt: [func(a=1)]
    assert _detect_pythonic_call(
        "[get_weather(city='NYC', unit='f')]"
    ) == ("get_weather", {"city": "NYC", "unit": "f"})
    # mistral: JSON array of calls
    assert _detect_json_array_call(
        '[{"name": "get_weather", "arguments": {"city": "Lima"}}]'
    ) == ("get_weather", {"city": "Lima"})
    assert _detect_json_array_call("hello [world]") is None
    for det in FAMILY_DETECT.values():
        assert det("a plain prose answer") is None


def test_code_interpreter_session():
    """NuminaMath code-interpreter loop (scripts/tool_numinamath.py): a
    reply ending with ```output triggers exec of the last python block and
    a tool_completion continuation."""
    from chatllm_tpu.tools.toolcall import CodeInterpreterSession

    class FakeLLM:
        def __init__(self):
            self.completions = []

        def chat(self, s):
            return ("Let me compute.\n```python\nprint(6*7)\n```\n```output")

        def tool_completion(self, s):
            self.completions.append(s)
            return "The answer is 42."

    llm = FakeLLM()
    sess = CodeInterpreterSession(llm, allow_exec=True)
    out = sess.chat("what is 6*7?")
    assert out == "The answer is 42."
    assert llm.completions == ["\n42\n```"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        CodeInterpreterSession(llm)          # exec must be opted into


def test_agents_orchestration():
    """Agent ports (reference scripts/translation_agent.py, ya_o1.py,
    crosstask.py, threecobblers.py) driven with scripted fake LLMs."""
    from chatllm_tpu.tools.agents import (CrossTalk, MixtureOfExperts,
                                          ThoughtAgent, TranslationAgent)

    class Fake:
        def __init__(self, replies):
            self.replies = list(replies)
            self.prompts = []
            self.prefix = ""

        def restart(self, sys_prompt=None):
            pass

        def set_ai_prefix(self, p):
            self.prefix = p

        def chat(self, s):
            self.prompts.append(s)
            return self.replies.pop(0) if self.replies else "ok"

    # translation: 3 calls — translate, reflect, improve
    ta = TranslationAgent(Fake(["T1", "suggestions", "T2"]),
                          "English", "French", country="France")
    out = ta.translate("hello")
    assert out == "T2"
    assert "SOURCE_TEXT" in ta.llm.prompts[1]
    assert "EXPERT_SUGGESTIONS" in ta.llm.prompts[2]
    assert "France" in ta.llm.prompts[1]

    # thought agent: 3 staged chats with ai prefixes
    f = Fake(["a", "b", "c"])
    th = ThoughtAgent(f)
    r = th.think("what is 2+2?")
    assert r == "a\nb\nc"
    assert f.prompts == ["what is 2+2?", "think again", "check your answer"]

    # crosstalk: replies feed each other
    a, b = Fake(["a1", "a2"]), Fake(["b1", "b2"])
    tr = CrossTalk(a, b).run("hi", rounds=2)
    assert [t for _, t in tr] == ["hi", "b1", "a1", "b2", "a2"]
    assert b.prompts == ["hi", "a1"]

    # mixture of experts: classifier routes to the named expert
    cls = Fake(["Maths is the right class"])
    math_x, other_x = Fake(["42"]), Fake(["?"])
    moe = MixtureOfExperts(cls, {"Maths": math_x, "Others": other_x})
    assert moe.chat("1+1?") == "42"
    assert math_x.prompts == ["1+1?"]


def test_set_ai_prefix(tmp_path):
    """chatllm_set_ai_prefix: the next AI reply is seeded with the prefix
    text (both in the generation input and the recorded message)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_forward import make_tiny_qwen2
    from chatllm_tpu.models import RuntimeConfig, load_model
    from chatllm_tpu.runtime.pipeline import Pipeline
    from chatllm_tpu.runtime.generate import GenerationConfig

    p = str(tmp_path / "m.bin")
    make_tiny_qwen2(p)
    m = load_model(p, RuntimeConfig(weight_dtype="float32",
                                    compute_dtype="float32",
                                    cache_dtype="float32"))
    pipe = Pipeline(m)
    pipe.gen_config = GenerationConfig(do_sample=False, max_new_tokens=4)
    pipe.ai_prefix = "Let me think."
    out = pipe.chat("hello")
    assert out.startswith("Let me think.")
    assert pipe.history[len(pipe.history) - 1].content.startswith("Let me think.")


import os  # noqa: E402


def test_r1_thought_agent():
    """ya_r1 port: one chat + escalating ai_continue nudges ending in a
    forced Final answer continuation (reference scripts/ya_r1.py)."""
    from chatllm_tpu.tools.agents import R1ThoughtAgent

    class Fake:
        def __init__(self):
            self.prefix = ""
            self.continues = []

        def restart(self, sys_prompt=None):
            pass

        def set_ai_prefix(self, p):
            self.prefix = p

        def chat(self, s):
            return " t0"

        def ai_continue(self, suffix=""):
            self.continues.append(suffix)
            return suffix + " more"

    f = Fake()
    out = R1ThoughtAgent(f).think("why?")
    assert f.continues == ["Hmm,", "But wait,", "Wait,", "Final answer:"]
    assert out.endswith("Final answer: more")
