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
    "glm4": glm4_system_prompt,
    "llama3.1": llama31_system_prompt,
}


class ToolCallSession:
    """Dispatch loop: chat → detect call → execute → tool_input → repeat
    (reference tool flow, bindings/libchatllm.h:285-305)."""

    def __init__(self, llm, registry: ToolRegistry, family: str = "qwen",
                 max_rounds: int = 4):
        self.llm = llm
        self.registry = registry
        self.max_rounds = max_rounds
        prompt_fn = FAMILY_PROMPTS.get(family, qwen_system_prompt)
        sys_prompt = prompt_fn(registry.schemas())
        llm.pipeline.tokenizer.sys_prompt = sys_prompt

    def chat(self, user_input: str) -> str:
        reply = self.llm.chat(user_input)
        for _ in range(self.max_rounds):
            call = detect_tool_call(reply)
            if call is None:
                return reply
            name, args = call
            result = self.registry.call(name, args or {})
            reply = self.llm.tool_input(result)
        return reply
