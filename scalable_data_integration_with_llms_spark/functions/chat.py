"""Chat-template prompt formatting (F12 real path).

The reference renders scoring prompts with the model tokenizer's chat
template — ``tokenizer.apply_chat_template(msgs, tokenize=False,
add_generation_prompt=True)`` over ``[{role: system}, {role: user}]``
(``Stable Schema Matching/prompt/PromptICLTemplate.py:86-95``).  The engine
ships the widely-published ChatML message format as its concrete template:

    <|im_start|>ROLE\\nCONTENT<|im_end|>\\n

with ``add_generation_prompt`` appending the empty assistant header.  Two
equivalent surfaces: a pure-Python function (driver-side parity/testing) and
a JVM Column expression (the hot path — pure ``concat``, whole-stage codegen,
no Python).  Both produce byte-identical strings, so prompt assembly stays
oracle-checkable in SQL as string concatenation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IM_START = "<|im_start|>"
IM_END = "<|im_end|>"


def apply_chat_template(
    messages: list[dict[str, str]], add_generation_prompt: bool = True
) -> str:
    """Render ``[{"role": ..., "content": ...}, ...]`` to the ChatML string —
    the reference's ``format_question`` contract, tokenizer-free."""
    out = []
    for m in messages:
        out.append(f"{IM_START}{m['role']}\n{m['content']}{IM_END}\n")
    if add_generation_prompt:
        out.append(f"{IM_START}assistant\n")
    return "".join(out)


def chat_prompt(
    system: Column | str, user: Column | str, add_generation_prompt: bool = True
) -> Column:
    """JVM-side twin of :func:`apply_chat_template` for the two-message
    (system, user) shape the reference's scoring prompts use."""
    sys_c = F.lit(system) if isinstance(system, str) else system
    usr_c = F.lit(user) if isinstance(user, str) else user
    parts = [
        F.lit(f"{IM_START}system\n"),
        sys_c,
        F.lit(f"{IM_END}\n{IM_START}user\n"),
        usr_c,
        F.lit(f"{IM_END}\n"),
    ]
    if add_generation_prompt:
        parts.append(F.lit(f"{IM_START}assistant\n"))
    return F.concat(*parts)
