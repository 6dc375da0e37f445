"""Agent orchestration ports of the reference's scripts/ agents:

 - `TranslationAgent` — translate → reflect → improve prompt chain
   (scripts/translation_agent.py, Andrew Ng's translation-agent recipe).
 - `ThoughtAgent` — ya_o1-style staged thinking: each stage seeds the AI
   reply with a thought prefix via set_ai_prefix (scripts/ya_o1.py).
 - `CrossTalk` — two LLMs conversing, each feeding the other's reply
   (scripts/crosstask.py).
 - `MixtureOfExperts` — threecobblers: a classifier model routes each
   question to a domain-expert model (scripts/threecobblers.py).

All of them drive the same `api.ChatLLM` surface the reference agents drive
through the C bindings.
"""
from __future__ import annotations


class TranslationAgent:
    """scripts/translation_agent.py one_chunk_translate_text: initial
    translation → expert reflection → edited translation."""

    def __init__(self, llm, source_lang: str, target_lang: str,
                 country: str = ""):
        self.llm = llm
        self.source_lang = source_lang
        self.target_lang = target_lang
        self.country = country

    def _ask(self, system: str, prompt: str) -> str:
        self.llm.restart(sys_prompt=system)
        return self.llm.chat(prompt).strip()

    def initial_translation(self, text: str) -> str:
        s, t = self.source_lang, self.target_lang
        return self._ask(
            f"You are an expert linguist, specializing in translation "
            f"from {s} to {t}.",
            f"This is an {s} to {t} translation, please provide the {t} "
            f"translation for this text. Do not provide any explanations "
            f"or text apart from the translation.\n{s}: {text}\n\n{t}:")

    def reflect(self, text: str, translation: str) -> str:
        s, t = self.source_lang, self.target_lang
        style = (f" The final style and tone of the translation should "
                 f"match the style of {t} colloquially spoken in "
                 f"{self.country}." if self.country else "")
        return self._ask(
            f"You are an expert linguist specializing in translation from "
            f"{s} to {t}. You will be provided with a source text and its "
            f"translation and your goal is to improve the translation.",
            f"Your task is to carefully read a source text and a "
            f"translation from {s} to {t}, and then give constructive "
            f"criticism and helpful suggestions to improve the "
            f"translation.{style}\n\n"
            f"The source text and initial translation, delimited by XML "
            f"tags <SOURCE_TEXT></SOURCE_TEXT> and "
            f"<TRANSLATION></TRANSLATION>, are as follows:\n\n"
            f"<SOURCE_TEXT>\n{text}\n</SOURCE_TEXT>\n\n"
            f"<TRANSLATION>\n{translation}\n</TRANSLATION>\n\n"
            f"When writing suggestions, pay attention to whether there are "
            f"ways to improve the translation's \n"
            f"(i) accuracy (by correcting errors of addition, "
            f"mistranslation, omission, or untranslated text),\n"
            f"(ii) fluency (by applying {t} grammar, spelling and "
            f"punctuation rules, and ensuring there are no unnecessary "
            f"repetitions),\n"
            f"(iii) style (by ensuring the translations reflect the style "
            f"of the source text and take into account any cultural "
            f"context),\n"
            f"(iv) terminology (by ensuring terminology use is consistent "
            f"and reflects the source text domain; and by only ensuring "
            f"you use equivalent idioms {t}).\n\n"
            f"Write a list of specific, helpful and constructive "
            f"suggestions for improving the translation.\n"
            f"Each suggestion should address one specific part of the "
            f"translation.\nOutput only the suggestions and nothing else.")

    def improve(self, text: str, translation: str, reflection: str) -> str:
        s, t = self.source_lang, self.target_lang
        return self._ask(
            f"You are an expert linguist, specializing in translation "
            f"editing from {s} to {t}.",
            f"Your task is to carefully read, then edit, a translation "
            f"from {s} to {t}, taking into\naccount a list of expert "
            f"suggestions and constructive criticisms.\n\n"
            f"The source text, the initial translation, and the expert "
            f"linguist suggestions are delimited by XML tags "
            f"<SOURCE_TEXT></SOURCE_TEXT>, <TRANSLATION></TRANSLATION> and "
            f"<EXPERT_SUGGESTIONS></EXPERT_SUGGESTIONS> as follows:\n\n"
            f"<SOURCE_TEXT>\n{text}\n</SOURCE_TEXT>\n\n"
            f"<TRANSLATION>\n{translation}\n</TRANSLATION>\n\n"
            f"<EXPERT_SUGGESTIONS>\n{reflection}\n</EXPERT_SUGGESTIONS>\n\n"
            f"Please take into account the expert suggestions when editing "
            f"the translation. Edit the translation by ensuring:\n\n"
            f"(i) accuracy (by correcting errors of addition, "
            f"mistranslation, omission, or untranslated text),\n"
            f"(ii) fluency (by applying {t} grammar, spelling and "
            f"punctuation rules and ensuring there are no unnecessary "
            f"repetitions), (iii) style (by ensuring the translations "
            f"reflect the style of the source text)\n"
            f"(iv) terminology (inappropriate for context, inconsistent "
            f"use), or\n(v) other errors.\n\n"
            f"Output only the new translation and nothing else.")

    def translate(self, text: str) -> str:
        t1 = self.initial_translation(text)
        refl = self.reflect(text, t1)
        return self.improve(text, t1, refl)


class ThoughtAgent:
    """ya_o1-style staged reasoning (scripts/ya_o1.py ThoughtLLM2): each
    stage restates the question with an AI-prefix seed nudging the model
    through break-down → re-think → self-check."""

    STAGES = [
        ("", "Let's break it down and think step by step.\n"),
        ("think again", "This question looks complex. Let me think again.\n"),
        ("check your answer", "Let me check if my answer is correct or not.\n"),
    ]

    def __init__(self, llm):
        self.llm = llm

    def think(self, prompt: str) -> str:
        self.llm.restart()
        parts = []
        for i, (followup, prefix) in enumerate(self.STAGES):
            self.llm.set_ai_prefix(prefix)
            parts.append(self.llm.chat(prompt if i == 0 else followup))
        self.llm.set_ai_prefix("")
        return "\n".join(parts)


class CrossTalk:
    """Two LLMs talking to each other (scripts/crosstask.py)."""

    def __init__(self, model_a, model_b):
        self.a = model_a
        self.b = model_b

    def run(self, opening: str, rounds: int = 4, on_turn=None):
        """`opening` is A's first line; each model replies to the other.
        Returns the transcript [(speaker, text), ...]."""
        transcript = [("A", opening)]
        msg = opening
        for _ in range(rounds):
            msg = self.b.chat(msg)
            transcript.append(("B", msg))
            if on_turn:
                on_turn("B", msg)
            msg = self.a.chat(msg)
            transcript.append(("A", msg))
            if on_turn:
                on_turn("A", msg)
        return transcript


class MixtureOfExperts:
    """threecobblers (scripts/threecobblers.py): a classifier LLM picks the
    domain, the matching expert answers."""

    def __init__(self, classifier, experts: dict):
        """experts: {domain_name: llm}; the LAST entry is the fallback."""
        self.classifier = classifier
        self.experts = dict(experts)

    def classify(self, prompt: str) -> str:
        classes = list(self.experts)
        class_str = "\n".join(f"{i + 1}. {c}" for i, c in enumerate(classes))
        self.classifier.restart()
        selected = self.classifier.chat(
            f"Please classify the question to one of these classes:\n"
            f"{class_str}\n\nQuestion: {prompt}")
        for c in classes:
            if c in selected:
                return c
        return classes[-1]

    def chat(self, prompt: str) -> str:
        domain = self.classify(prompt)
        return self.experts[domain].chat(prompt)


class R1ThoughtAgent:
    """ya_r1-style continued-generation thinking (scripts/ya_r1.py
    ThoughtLLM): one chat seeded with an opening thought, then the SAME
    reply is extended via ai-continue with escalating "Wait," nudges,
    finishing with a forced "Final answer:" continuation."""

    PROCEDURES = [
        "Okay, let me think step by step. The question is",
        "Hmm,",
        "But wait,",
        "Wait,",
    ]
    FINAL = "Final answer:"

    def __init__(self, llm):
        self.llm = llm

    def think(self, prompt: str) -> str:
        self.llm.restart()
        procs = list(self.PROCEDURES)
        self.llm.set_ai_prefix(procs.pop(0))
        out = [self.llm.chat(prompt)]
        self.llm.set_ai_prefix("")
        for nudge in procs:
            out.append(self.llm.ai_continue(nudge))
        out.append(self.llm.ai_continue(self.FINAL))
        return "".join(out)
