"""Per-rule proofs for every canonicalizer ledger entry marked `proven`
(plans/canonicalize.py REFERENCE_RULES) — the reference rules this engine
DELIBERATELY does not apply.

Each test cites the reference rule file under
/root/reference/vendor/blaze/src/canonicalizer/rules/ and demonstrates in
code ONE of two things:

* pessimization proof — the rewrite is semantics-preserving (validated
  over a probe corpus on the pure-Python evaluator) but produces a Spark
  plan that is no smaller, and usually strictly larger, than the
  unrewritten schema's plan: blaze normalizes toward anyOf-dispatch /
  allOf-isolation because its interpreter wants those IR shapes, while
  Catalyst compiles the conjunct/typed form to fewer expression nodes;
* unsoundness proof — applying the rewrite CHANGES observable output
  under this engine's contracts (annotation identity, dangling-$ref
  hard-error), so it must not run here.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark import canonicalize, validate
from jsonschema_spark.plans.pyeval import EvalError, validate_py
from jsonschema_spark.plans.upgrade import upgrade_schema

D3 = {"$schema": "http://json-schema.org/draft-03/schema#"}

PROBES = [None, True, False, 0, 1, 2, 3, 5, 13, 100, -1, 2.5, 4.0,
          "", "a", "ab", "abcd", "no", [1, 2], [], {}, {"a": 1},
          {"a": "x", "b": 2}, {"b": True}]


def _agree(s1, s2, probes=PROBES):
    """Both schemas accept exactly the same probe values."""
    for p in probes:
        assert validate_py(s1, p) == validate_py(s2, p), (p, s1, s2)


def _plan(spark, schema) -> str:
    """Optimized Spark plan of the tree-path fast validate — the string
    whose size we compare across rewrite variants (auto-generated
    expression ids #N stripped so identical plans compare equal)."""
    import re

    # doc must be NON-literal or Catalyst constant-folds the entire
    # predicate away and every variant compares equal trivially
    df = spark.range(2).select(
        F.format_string('{"a":%d}', F.col("id")).alias("doc"))
    plan = (validate(df, schema, doc_col="doc")
            ._jdf.queryExecution().optimizedPlan().toString())
    return re.sub(r"#\d+", "#", plan)


# --- pessimization proofs ----------------------------------------------------


def test_enum_split_by_type_is_a_noop_here(spark):
    """enum_split_by_type.h splits a mixed-kind enum into per-kind anyOf
    branches so blaze can dispatch branches by instance kind. This engine
    already gets that benefit from enum_filter_by_type + static column
    typing: on the flat path the mixed enum and the split form compile to
    the IDENTICAL optimized plan (one membership check over the members
    applicable to the column's type; foreign-kind branches fold to false
    statically), so the split rewrite buys nothing and the ledger keeps
    the unsplit fixpoint."""
    import re

    orig = {"enum": [1, 2, "a", "b", True]}
    split = {"anyOf": [{"enum": [True]}, {"enum": [1, 2]},
                       {"enum": ["a", "b"]}]}
    _agree(orig, split)
    assert "enum" in canonicalize(orig) and "anyOf" not in canonicalize(orig)

    df = spark.range(3).selectExpr("id as a")

    def flat_plan(schema):
        p = (validate(df, {"properties": {"a": schema}},
                      instance_cols=["a"])
             ._jdf.queryExecution().optimizedPlan().toString())
        return re.sub(r"#\d+", "#", p)

    assert flat_plan(orig) == flat_plan(split)
    # and the variant (dynamically-typed) path stays equivalent in size:
    # per-kind dispatch happens per enum VALUE either way
    assert abs(len(_plan(spark, orig)) - len(_plan(spark, split))) < \
        0.2 * len(_plan(spark, orig))


def test_required_properties_in_properties_is_a_noop_here(spark):
    """required_properties_in_properties.h inserts `true` stubs into
    `properties` for required names not otherwise declared — blaze needs
    a property LOCATION to anchor its IR. Our compiler anchors `required`
    directly on the instance, a `true` subschema compiles to a constant
    pass, and Catalyst folds it away: the optimized plans are IDENTICAL,
    so the rewrite buys nothing."""
    orig = {"type": "object", "required": ["a", "b"],
            "properties": {"a": {"type": "string"}}}
    rewr = {"type": "object", "required": ["a", "b"],
            "properties": {"a": {"type": "string"}, "b": True}}
    _agree(orig, rewr)
    assert _plan(spark, orig) == _plan(spark, rewr)


def test_type_array_to_any_of_is_a_pessimization(spark):
    """type_array_to_any_of.h turns `type: [a, b]` + siblings into an
    anyOf with the type-applicable siblings distributed into branches.
    Same acceptance; but our compiler emits ONE kind check for the type
    union and keeps each sibling compiled once, while the anyOf form
    duplicates the branch scaffolding — plan no smaller, typically
    larger. canonicalize keeps the union form (type_union_implicit
    handles the single-entry degenerate case)."""
    orig = {"type": ["string", "integer"], "minLength": 3, "minimum": 10}
    rewr = {"anyOf": [{"type": "string", "minLength": 3},
                      {"type": "integer", "minimum": 10}]}
    _agree(orig, rewr)
    c = canonicalize(orig)
    assert c.get("type") == ["string", "integer"]
    assert len(_plan(spark, orig)) <= len(_plan(spark, rewr))


def test_type_inherit_in_place_is_a_noop_here(spark):
    """type_inherit_in_place.h copies an ancestor's `type` into in-place
    applicator branches so blaze's per-branch compiler can specialize.
    Our branches are compiled against the SAME instance slot the parent
    already type-gates, so the inherited `type` re-checks a condition
    that is conjoined anyway: acceptance identical, plan no smaller."""
    orig = {"type": "integer", "anyOf": [{"minimum": 3}, {"maximum": 0}]}
    rewr = {"type": "integer",
            "anyOf": [{"type": "integer", "minimum": 3},
                      {"type": "integer", "maximum": 0}]}
    _agree(orig, rewr)
    assert len(_plan(spark, orig)) <= len(_plan(spark, rewr))


def test_type_union_distribute_keywords_equivalent_conjunct_form():
    """type_union_distribute_keywords.h (draft-3 only) pushes sibling
    assertions into the schema branches of a `type` union. Draft-3
    sibling assertions only constrain instances of their applicable
    type, so the parent-conjunct form our upgrade produces accepts the
    exact same set — distribution is blaze IR tuning, not semantics.
    Proven by upgrading both shapes and probing."""
    orig = {**D3, "type": [{"type": "string"}, {"type": "integer"}],
            "minLength": 2}
    dist = {**D3, "type": [{"type": "string", "minLength": 2},
                           {"type": "integer"}]}
    _agree(upgrade_schema(orig), upgrade_schema(dist))


def test_type_union_to_schemas_realized_by_upgrade():
    """type_union_to_schemas.h embeds string entries of a draft 0-3
    `type` union as schemas ({"enum":[null]}, {"enum":[false,true]},
    {"type": t}). Our upgrade realizes the same union as anyOf branches
    (strings stay native `type` members); upgrading the REFERENCE's
    output accepts exactly what our native form accepts."""
    ours = {**D3, "type": ["null", "boolean", "string"]}
    ref_out = {**D3, "type": [{"enum": [None]}, {"enum": [False, True]},
                              {"type": "string"}]}
    _agree(upgrade_schema(ours), upgrade_schema(ref_out))


def test_type_with_applicator_to_allof_is_a_pessimization(spark):
    """type_with_applicator_to_allof.h isolates structural keywords and
    each applicator into separate allOf branches (blaze evaluates
    branches independently). Our compiler already conjoins every keyword
    on a node natively — the allOf wrapper adds branch scaffolding with
    zero acceptance change; canonicalize's allOf-merge partially undoes
    it (the inverse direction)."""
    orig = {"type": "integer", "minimum": 0, "not": {"const": 5},
            "anyOf": [{"maximum": 10}, {"minimum": 100}]}
    rewr = {"allOf": [{"type": "integer", "minimum": 0},
                      {"not": {"const": 5}},
                      {"anyOf": [{"maximum": 10}, {"minimum": 100}]}]}
    _agree(orig, rewr)
    _agree(canonicalize(orig), canonicalize(rewr))
    assert len(_plan(spark, orig)) <= len(_plan(spark, rewr))


def test_type_with_applicator_to_extends_equivalent_through_upgrade():
    """type_with_applicator_to_extends.h is the draft 0-3 twin: typed
    keywords move into an `extends` branch next to the other applicators.
    extends is a conjunction, so the isolated form equals the in-place
    form; our upgrade maps both through extends→allOf and the probe
    corpus agrees."""
    orig = {**D3, "type": "integer", "minimum": 0,
            "extends": {"maximum": 10}}
    rewr = {**D3, "extends": [{"type": "integer", "minimum": 0},
                              {"maximum": 10}]}
    _agree(upgrade_schema(orig), upgrade_schema(rewr))


# --- unsoundness proofs -------------------------------------------------------


def test_unknown_keywords_prefix_breaks_annotation_identity(spark):
    """unknown_keywords_prefix.h renames unknown keywords to `x-…` so
    blaze can ignore them uniformly. Here unknown keywords are ANNOTATION
    SOURCES (operators/annotations.py): renaming changes the emitted
    keywordLocation, i.e. observable output — the rewrite is unsound
    under the annotation contract even though raw verdicts agree."""
    from jsonschema_spark.operators.annotations import annotations

    orig = {"type": "string", "myExtension": "v1"}
    rewr = {"type": "string", "x-myExtension": "v1"}
    _agree(orig, rewr)

    df = spark.createDataFrame([(1, '"hi"')], ["id", "doc"])

    def locs(schema):
        rows = annotations(df, schema, ["id"], doc_col="doc").collect()
        return sorted(r["keywordLocation"] for r in rows)

    lo, lr = locs(orig), locs(rewr)
    assert "/myExtension" in lo
    assert "/myExtension" not in lr and "/x-myExtension" in lr
    assert lo != lr  # observable divergence → rewrite must not run


def test_unknown_local_ref_erasure_masks_bugs():
    """unknown_local_ref.h silently ERASES a `$ref` whose local target
    does not exist ("we just help making the schema valid"). This
    engine's contract is the opposite: a dangling ref is a hard
    EvalError/lint finding, never a silent accept-all — erasing the ref
    flips an error into a pass for every instance, masking the schema
    bug."""
    orig = {"$ref": "#/$defs/missing"}
    with pytest.raises(EvalError):
        validate_py(orig, 1)
    erased = {}  # the reference's transform: schema.erase("$ref")
    assert validate_py(erased, 1) is True  # silent accept-all


def test_ledger_has_no_bare_skips_and_every_proven_rule_is_tested():
    """Every REFERENCE_RULES entry is realized (direct/inverse/upgrade),
    a representation no-op, or `proven` — and each proven rule has a
    test_<rule>* proof in this file. No bare 'skip' entries remain."""
    from jsonschema_spark.plans.canonicalize import REFERENCE_RULES

    here = globals()
    statuses = set(REFERENCE_RULES.values())
    assert "skip" not in statuses, statuses
    assert statuses <= {"direct", "inverse", "upgrade", "repr", "proven"}
    for rule, status in REFERENCE_RULES.items():
        if status == "proven":
            assert any(name.startswith(f"test_{rule}") for name in here), rule
