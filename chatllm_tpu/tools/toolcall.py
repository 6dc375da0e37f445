"""Tool/function-calling plumbing.

Reference analog: the per-model tool-calling scripts + interceptors
(/root/reference/scripts/tool_qwen.py, tool_glm4.py, tool_llama3.1.py,
docs/tool_calling.md; model-side interceptors e.g. models/mistral.cpp:127).

`ToolRegistry` collects python functions with JSON-schema-ish metadata;
`ToolCallSession` wraps a ChatLLM, builds the model family's tool system
prompt, detects tool calls in the reply, executes, and feeds results back
through `tool_input` until the model answers in prose.
"""
from __future__ import annotations

import inspect
import json
import re
from typing import Callable


class ToolRegistry:
    def __init__(self):
        self.tools: dict[str, dict] = {}

    def register(self, fn: Callable = None, *, name: str = None,
                 description: str = ""):
        def deco(f):
            sig = inspect.signature(f)
            props = {}
            required = []
            for pname, p in sig.parameters.items():
                ptype = {int: "integer", float: "number", bool: "boolean"}.get(
                    p.annotation, "string")
                props[pname] = {"type": ptype, "description": ""}
                if p.default is inspect.Parameter.empty:
                    required.append(pname)
            self.tools[name or f.__name__] = {
                "fn": f,
                "schema": {
                    "name": name or f.__name__,
                    "description": description or (f.__doc__ or "").strip(),
                    "parameters": {"type": "object", "properties": props,
                                   "required": required},
                },
            }
            return f

        return deco(fn) if fn is not None else deco

    def schemas(self) -> list[dict]:
        return [t["schema"] for t in self.tools.values()]

    def call(self, name: str, arguments: dict) -> str:
        if name not in self.tools:
            return json.dumps({"error": f"unknown tool {name}"})
        try:
            r = self.tools[name]["fn"](**arguments)
            return r if isinstance(r, str) else json.dumps(r, ensure_ascii=False)
        except Exception as e:  # result surface mirrors the scripts' behavior
            return json.dumps({"error": str(e)})


# --- per-family prompt formats + call detection -----------------------------

def qwen_system_prompt(tools: list[dict], base: str = "You are a helpful assistant.") -> str:
    """Hermes-style <tools> block (reference scripts/tool_qwen.py)."""
    lines = [base, "", "# Tools", "",
             "You may call one or more functions to assist with the user query.",
             "", "You are provided with function signatures within "
             "<tools></tools> XML tags:", "<tools>"]
    for t in tools:
        lines.append(json.dumps({"type": "function", "function": t},
                                ensure_ascii=False))
    lines += ["</tools>", "",
              "For each function call, return a json object with function "
              "name and arguments within <tool_call></tool_call> XML tags:",
              '<tool_call>', '{"name": <function-name>, "arguments": <args-json-object>}',
              '</tool_call>']
    return "\n".join(lines)


def glm4_system_prompt(tools: list[dict], base: str = "") -> str:
    """GLM-4 tool block (reference scripts/tool_glm4.py)."""
    lines = [base or "你是一个名为 GLM-4 的人工智能助手。",
             "", "# 可用工具"]
    for t in tools:
        lines.append(f"\n## {t['name']}\n\n{json.dumps(t, ensure_ascii=False, indent=4)}\n"
                     "在调用上述函数时,请使用 Json 格式表示调用的参数。")
    return "\n".join(lines)


def llama31_system_prompt(tools: list[dict], base: str = "") -> str:
    """Llama-3.1 ipython-style (reference scripts/tool_llama3.1.py)."""
    head = ("Environment: ipython\n"
            "Cutting Knowledge Date: December 2023\n\n"
            + (base or "You are a helpful assistant with tool calling "
                       "capabilities."))
    body = ("\n\nGiven the following functions, respond with a JSON for a "
            "function call with its proper arguments that best answers the "
            "given prompt.\n\nRespond in the format "
            '{"name": function name, "parameters": dictionary of argument '
            "name and its value}. Do not use variables.\n\n"
            + "\n".join(json.dumps(t, indent=4) for t in tools))
    return head + body


def glm3_system_prompt(tools: list[dict], base: str = "") -> str:
    """GLM-3 (reference scripts/tool_glm3.py): tools as JSON with a `params`
    key; the model replies `tool_name\\n```python\\ntool_call(k=v, ...)```."""
    conv = [{**{k: v for k, v in t.items() if k != "parameters"},
             "params": t["parameters"]} for t in tools]
    return ("Answer the following questions as best as you can. You have "
            "access to the following tools: \n\n"
            + json.dumps(conv, indent=4, ensure_ascii=False))


def codegeex4_system_prompt(tools: list[dict], base: str = "") -> str:
    """CodeGeeX4 (reference scripts/tool_codegeex4.py): per-function
    markdown sections, JSON reply."""
    parts = ["\n你将接收到一个用户提出的问题，并请撰写清晰、简洁且准确的答案。\n\n"
             "- 我将给你提供一些函数工具的接口信息，包括函数的定义、用途、名字、参数名和参数类型。\n"
             "- 请根据这些信息，为用户的指令，从中选择最合适的函数，并给出调用时需要使用的参数。\n"
             "- **返回类型为一个json格式的字符串，包含函数名和参数字典。**\n"
             "    - name: 函数名\n    - arguments: 参数字典，其中key为参数名，value为参数类型。\n"
             "- **只需要生成答案即可，无需在你的回答之前或之后做出解释，也不要直接回答用户的问题。**\n"
             "- 只用当提供的函数工具不足以完成任务时，请你用正常的语气告知用户并解释原因。\n\n"
             "以下是可使用的函数工具的接口信息。\n"]
    for i, t in enumerate(tools):
        parts.append(f"\n## Function {i + 1}\n\n### Name\n{t['name']}\n"
                     f"\n### Description\n{t['description']}\n"
                     f"\n### Parameters\n```json\n"
                     f"{json.dumps(t['parameters'], ensure_ascii=False)}\n```\n")
    return "".join(parts)


def deepseekcoder_system_prompt(tools: list[dict], base: str = "") -> str:
    """DeepSeek Coder (reference scripts/tool_deepseekcoder.py): GLM4-style
    sections; the model replies `tool_name\\n```json {...}```."""
    import datetime

    value = (base or "你是一个名为 DeepSeek Coder 的人工智能助手。你的任务是针对用户的问题和要求提供适当的答复和支持。")
    value += "\n\n" + datetime.date.today().strftime("当前日期: %Y-%m-%d")
    value += "\n\n# 可用工具"
    for t in tools:
        value += (f"\n\n## {t['name']}\n\n{json.dumps(t, ensure_ascii=False, indent=4)}"
                  "\n在调用上述函数时，直接输出函数名，并请使用 Json 格式表示调用的参数。")
    return value


def internlm_system_prompt(tools: list[dict], base: str = "") -> str:
    """InternLM (reference scripts/tool_internlm.py): META_CN + JSON tool
    list; the model emits `<|plugin|>{json}`."""
    conv = [{**t, "parameters": [
        {"name": n, **p} for n, p in t["parameters"]["properties"].items()
        if n in t["parameters"].get("required", ())]} for t in tools]
    return ("当开启工具以及代码时，根据需求选择合适的工具进行调用\n"
            "你可以使用如下工具：\n"
            + json.dumps(conv, ensure_ascii=False, indent=4)
            + "\n如果你已经获得足够信息，请直接给出答案. 避免不必要的工具调用! "
              "同时注意你可以使用的工具，不要随意捏造！")


def mistral_tool_prefix(tools: list[dict]) -> str:
    """Mistral (reference scripts/tool_mistral.py): tools ride the USER
    message as [AVAILABLE_TOOLS]...[/AVAILABLE_TOOLS], not the system
    prompt; the model replies with a JSON array of calls."""
    wrapped = [{"type": "function", "function": t} for t in tools]
    return ("[AVAILABLE_TOOLS]" + json.dumps(wrapped, ensure_ascii=False)
            + "[/AVAILABLE_TOOLS]")


def qwen25_system_prompt(tools: list[dict], base: str = "") -> str:
    """Qwen2.5 (reference scripts/tool_qwen2.5.py): hermes block with the
    current date header."""
    import datetime

    head = (base or "You are Qwen, created by Alibaba Cloud. You are a "
                    "helpful assistant.")
    head += "\n\nCurrent Date: " + datetime.date.today().isoformat()
    return qwen_system_prompt(tools, head)


def watt_system_prompt(tools: list[dict], base: str = "") -> str:
    """Watt-tool (reference scripts/tool_watt.py): pythonic
    [func(a=1, b=2)] call format."""
    conv = [{"name": t["name"], "description": t["description"],
             "arguments": {"type": "dict",
                           "properties": t["parameters"]["properties"],
                           "required": t["parameters"].get("required", [])}}
            for t in tools]
    return ("You are an expert in composing functions. You are given a "
            "question and a set of possible functions. Based on the "
            "question, you will need to make one or more function/tool "
            "calls to achieve the purpose.\n"
            "If none of the function can be used, point it out. If the "
            "given question lacks the parameters required by the function, "
            "also point it out.\n"
            "You should only return the function call in tools call "
            "sections.\n\n"
            "If you decide to invoke any of the function(s), you MUST put "
            "it in the format of [func_name1(params_name1=params_value1, "
            "params_name2=params_value2...), func_name2(params)]\n"
            "You SHOULD NOT include any other text in the response.\n"
            "Here is a list of functions in JSON format that you can "
            f"invoke.\n{conv}\n")


def groq_system_prompt(tools: list[dict], base: str = "") -> str:
    """Groq-tuned llama (reference scripts/tool_groq.py): <tools> defs,
    <tool_call> JSON replies with ids."""
    defs = "\n".join(json.dumps({"name": t["name"],
                                 "description": t["description"],
                                 "parameters": t["parameters"]},
                                ensure_ascii=False, indent=4) for t in tools)
    return ("You are a function calling AI model. You are provided with "
            "function signatures within <tools></tools> XML tags. You may "
            "call one or more functions to assist with the user query. "
            "Don't make assumptions about what values to plug into "
            "functions. For each function call return a json object with "
            "function name and arguments within <tool_call></tool_call> "
            "XML tags as follows:\n<tool_call>\n"
            '{"id": <monotonically-increasing-id>, "name": <function-name>, '
            '"arguments": <args-dict>}\n</tool_call>\n'
            f"Here are the available tools:\n<tools> {defs} </tools>")


def _detect_glm_block_call(text: str):
    """`tool_name\\n```python tool_call(k=v)``` / ```json {...}``` (GLM-3 /
    DeepSeek-Coder reply shapes)."""
    lines = text.strip().split("\n", 1)
    if len(lines) != 2:
        return None
    name = lines[0].strip()
    if not re.fullmatch(r"[\w.-]+", name):
        return None
    m = re.findall(r"```([^\n]*)\n(.*?)```", lines[1], re.S)
    if not m:
        return None
    kind, code = m[-1]
    code = code.strip()
    try:
        if code.startswith("tool_call("):
            args = {}
            body = code[len("tool_call("):code.rfind(")")]
            for part in re.findall(r"(\w+)\s*=\s*('[^']*'|\"[^\"]*\"|[^,]+)",
                                   body):
                k, v = part
                v = v.strip()
                if v[:1] in "'\"":
                    args[k] = v[1:-1]
                else:
                    try:
                        args[k] = json.loads(v)
                    except json.JSONDecodeError:
                        args[k] = v
            return name, args
        obj = json.loads(code)
        if not isinstance(obj, dict):
            return None
        return name, obj.get("arguments", obj.get("parameters", obj))
    except (json.JSONDecodeError, ValueError):
        return None


def _detect_plugin_call(text: str):
    """InternLM `<|plugin|>{json}`."""
    m = re.search(r"<\|plugin\|>\s*(\{.*\})", text, re.S)
    if not m:
        return None
    try:
        obj = json.loads(m.group(1))
        return obj.get("name"), obj.get("parameters", obj.get("arguments", {}))
    except json.JSONDecodeError:
        return None


def _detect_pythonic_call(text: str):
    """Watt `[func(a=1, b='x')]`."""
    s = text.strip()
    m = re.match(r"\[\s*([\w.-]+)\((.*?)\)\s*[,\]]", s, re.S)
    if not m:
        return None
    name, body = m.group(1), m.group(2)
    args = {}
    for k, v in re.findall(r"(\w+)\s*=\s*('[^']*'|\"[^\"]*\"|[^,)]+)", body):
        v = v.strip()
        if v[:1] in "'\"":
            args[k] = v[1:-1]
        else:
            try:
                args[k] = json.loads(v)
            except json.JSONDecodeError:
                args[k] = v
    return name, args


def _detect_json_array_call(text: str):
    """Mistral [TOOL_CALLS] visible form: a JSON array of calls — execute
    the first (the session loop feeds results one at a time)."""
    s = text.strip()
    if s.startswith("[TOOL_CALLS]"):
        s = s[len("[TOOL_CALLS]"):].strip()
    if not (s.startswith("[") and s.endswith("]")):
        return None
    try:
        calls = json.loads(s)
    except json.JSONDecodeError:
        return None
    if isinstance(calls, list) and calls and isinstance(calls[0], dict) \
            and "name" in calls[0]:
        c = calls[0]
        return c["name"], c.get("arguments", c.get("parameters", {}))
    return None


_TOOL_CALL_PATTERNS = [
    re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S),   # qwen
    re.compile(r"✿FUNCTION✿[:：]\s*(\S+)\s*✿ARGS✿[:：]\s*(\{.*?\})", re.S),
]


def detect_tool_call(text: str):
    """Returns (name, arguments dict) or None."""
    for pat in _TOOL_CALL_PATTERNS:
        m = pat.search(text)
        if m:
            try:
                if m.re.groups == 2:
                    return m.group(1), json.loads(m.group(2))
                obj = json.loads(m.group(1))
                return obj.get("name"), obj.get("arguments", obj.get("parameters", {}))
            except json.JSONDecodeError:
                continue
    # bare JSON function call (llama3.1 / glm styles)
    stripped = text.strip()
    if stripped.startswith("{") and stripped.endswith("}"):
        try:
            obj = json.loads(stripped)
            if "name" in obj and ("parameters" in obj or "arguments" in obj):
                return obj["name"], obj.get("arguments", obj.get("parameters", {}))
        except json.JSONDecodeError:
            pass
    return None


FAMILY_PROMPTS = {
    "qwen": qwen_system_prompt,
    "qwen2.5": qwen25_system_prompt,
    "glm4": glm4_system_prompt,
    "glm3": glm3_system_prompt,
    "codegeex4": codegeex4_system_prompt,
    "deepseekcoder": deepseekcoder_system_prompt,
    "internlm": internlm_system_prompt,
    "llama3.1": llama31_system_prompt,
    "watt": watt_system_prompt,
    "groq": groq_system_prompt,
}

# family-specific reply parsers; detect_tool_call is the generic fallback
FAMILY_DETECT = {
    "glm3": _detect_glm_block_call,
    "deepseekcoder": _detect_glm_block_call,
    "internlm": _detect_plugin_call,
    "watt": _detect_pythonic_call,
    "mistral": _detect_json_array_call,
}


class ToolCallSession:
    """Dispatch loop: chat → detect call → execute → tool_input → repeat
    (reference tool flow, bindings/libchatllm.h:285-305; the per-model
    scripts scripts/tool_*.py are the prompt/parse formats)."""

    def __init__(self, llm, registry: ToolRegistry, family: str = "qwen",
                 max_rounds: int = 4):
        self.llm = llm
        self.registry = registry
        self.max_rounds = max_rounds
        self.family = family
        if family == "mistral":
            # tools ride the first user message, not the system prompt
            self._user_prefix = mistral_tool_prefix(registry.schemas())
        else:
            self._user_prefix = ""
            prompt_fn = FAMILY_PROMPTS.get(family, qwen_system_prompt)
            llm.pipeline.tokenizer.sys_prompt = prompt_fn(registry.schemas())

    def _detect(self, reply: str):
        det = FAMILY_DETECT.get(self.family)
        if det is not None:
            r = det(reply)
            if r is not None:
                return r
        return detect_tool_call(reply)

    def chat(self, user_input: str) -> str:
        reply = self.llm.chat(self._user_prefix + user_input)
        for _ in range(self.max_rounds):
            call = self._detect(reply)
            if call is None:
                return reply
            name, args = call
            result = self.registry.call(name, args or {})
            reply = self.llm.tool_input(result)
        return reply


class CodeInterpreterSession:
    """NuminaMath-style python code interpreter loop (reference
    scripts/tool_numinamath.py): when the reply ends with ```output, run the
    last ```python block and feed the captured stdout back as a completion.
    exec() of model output — gate behind allow_exec like the reference's
    'NO SAND-BOXING' warning."""

    OUTPUT_TAG = "```output"

    def __init__(self, llm, max_rounds: int = 4, allow_exec: bool = False,
                 executor=None):
        self.llm = llm
        self.max_rounds = max_rounds
        self.executor = executor or (self._exec if allow_exec else None)
        if self.executor is None:
            raise ValueError("pass allow_exec=True (UNSANDBOXED, demo only) "
                             "or a custom executor")

    @staticmethod
    def _exec(python_code: str) -> str:
        import io

        out = io.StringIO()

        def p(*args, **kwargs):
            print(*args, file=out, **kwargs)

        try:
            exec(python_code, {"print": p})
        except Exception as e:
            p(f"error: {e}")
        return out.getvalue()

    def chat(self, user_input: str) -> str:
        reply = self.llm.chat(user_input)
        for _ in range(self.max_rounds):
            if not reply.rstrip().endswith(self.OUTPUT_TAG):
                return reply
            blocks = re.findall(r"```python(.*?)```", reply, re.S)
            if not blocks:
                return reply
            result = self.executor(blocks[-1]).strip(" \r\n")
            reply = self.llm.tool_completion("\n" + result + "\n```")
        return reply
