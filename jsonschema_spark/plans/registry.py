"""Custom keyword-compiler registry — the §2.7 extension hook.

The reference exposes a ``Compiler`` std::function hook so users can
compile their own keywords
(/root/reference/vendor/blaze/src/compiler/include/sourcemeta/blaze/compiler.h:77-80).
Here a registered keyword maps to a Column-builder consulted by
``compile_node`` for any schema key the built-in dispatch does not
handle; its condition composes into the conjunction like any built-in
assertion, and its violations carry the registered message.

    from jsonschema_spark.plans.registry import register_keyword

    register_keyword(
        "x-even",
        build=lambda value, ctx: (ctx.num_val() % 2 == 0) if value else True,
        message=lambda ctx, value: F.lit("The value was expected to be even"),
        type_guard="number",
    )

``build(value, ctx) -> Cond`` returns the assertion (True/False/Column);
``message(ctx, value) -> Column`` the violation text; ``type_guard``
optionally names a JSON type — other types pass vacuously (the
EVALUATE_BEGIN precondition-skip, evaluator_dispatch.h:71-123).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import functions as F


@dataclass(frozen=True)
class KeywordCompiler:
    name: str
    build: Callable  # (value, ctx) -> Cond
    message: Callable  # (ctx, value) -> Column
    type_guard: Optional[str] = None  # JSON type name or None


KEYWORD_COMPILERS: dict[str, KeywordCompiler] = {}


def register_keyword(
    name: str,
    build: Callable,
    message: Optional[Callable] = None,
    type_guard: Optional[str] = None,
) -> None:
    if message is None:
        def message(ctx, value, _n=name):  # noqa: ARG001
            return F.lit(f"The value was expected to validate against the {_n} keyword")
    KEYWORD_COMPILERS[name] = KeywordCompiler(name, build, message, type_guard)


def unregister_keyword(name: str) -> None:
    KEYWORD_COMPILERS.pop(name, None)
