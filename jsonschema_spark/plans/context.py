"""Evaluation contexts — how a compiled schema node reads its instance value.

The reference evaluates one JSON document at a time against a compiled
instruction tree (/root/reference/vendor/blaze/src/evaluator/evaluator.h:109).
We invert that: a *context* describes where a value lives inside a DataFrame
row, and every schema keyword compiles to a boolean Column over that context.

Two families:

- ``FlatRowCtx`` / ``FlatColCtx`` — the instance is the row itself; JSON
  properties are native typed columns. JSON types are static (from the Spark
  schema), so type assertions constant-fold at compile time and the whole
  plan stays inside whole-stage codegen.

- ``VariantCtx`` — the instance is a JSON document in a string column,
  parsed once via Spark 4 ``parse_json`` into a VARIANT. Type tags come from
  ``schema_of_variant`` (per row), children from variant path extraction /
  ``map<string,variant>`` casts. Missing key → SQL NULL variant; JSON null →
  VOID variant — exactly the distinction the reference's evaluator makes
  between an absent property and a null value.

JSON type names follow the reference's ``type_name``
(/root/reference/vendor/blaze/src/evaluator/evaluator_describe.cc:33-53):
null, boolean, integer, number, string, array, object.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column, functions as F, types as T

Cond = Union[bool, Column]  # static-foldable boolean


def B(x: Cond) -> Column:
    """Lift a static bool to a Column."""
    return F.lit(x) if isinstance(x, bool) else x


def S(x: Union[str, Column]) -> Column:
    return F.lit(x) if isinstance(x, str) else x


def and_(*conds: Cond) -> Cond:
    """Conjunction with static folding."""
    cols: list[Column] = []
    for c in conds:
        if c is False:
            return False
        if c is True:
            continue
        cols.append(c)
    if not cols:
        return True
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def or_(*conds: Cond) -> Cond:
    cols: list[Column] = []
    for c in conds:
        if c is True:
            return True
        if c is False:
            continue
        cols.append(c)
    if not cols:
        return False
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def not_(c: Cond) -> Cond:
    if isinstance(c, bool):
        return not c
    return ~c


def json_escape_col(col: Column) -> Column:
    """JSON-escape a string Column (quotes + backslashes; control chars are
    left as-is — the reference's message escaping is similarly minimal, see
    escape_string in evaluator_describe.cc:63-84)."""
    return F.concat(
        F.lit('"'),
        F.replace(
            F.replace(col, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        ),
        F.lit('"'),
    )


_IDENT_SAFE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


class Ctx:
    """Abstract instance-value context.

    ``loc`` is the JSON-pointer instance location (str when static, Column
    when inside an array loop). ``present`` is whether the value exists at
    all (absent property → keywords are vacuously satisfied, but ``required``
    on the parent fails).
    """

    loc: Union[str, Column]
    present: Cond

    def loc_col(self) -> Column:
        return S(self.loc)

    # --- type system -------------------------------------------------
    def tag(self) -> Union[str, Column]:
        """JSON type name of the value (reference type_name semantics;
        reals/decimals → 'number', never 'integer' even when integral —
        integer unification happens in is_type)."""
        raise NotImplementedError

    def is_type(self, t: str) -> Cond:
        """Loose JSON Schema type test: 'integer' accepts reals with zero
        fraction; 'number' accepts integers (evaluator_dispatch.h:828-837)."""
        raise NotImplementedError

    # --- scalar accessors (only meaningful under the right type guard) ---
    def str_val(self) -> Column:
        raise NotImplementedError

    def num_val(self) -> Column:
        raise NotImplementedError

    def bool_val(self) -> Column:
        raise NotImplementedError

    # --- containers ---------------------------------------------------
    def arr(self) -> Column:
        """array column (elements as VARIANT in the tree path)."""
        raise NotImplementedError

    def arr_size(self) -> Column:
        return F.size(self.arr())

    def element_ctx_factory(self) -> Callable[[Column, Column], "Ctx"]:
        """(element, index) -> Ctx for use inside F.transform lambdas."""
        raise NotImplementedError

    def obj_keys(self) -> Column:
        raise NotImplementedError

    def obj_size(self) -> Column:
        return F.size(self.obj_keys())

    def get_prop(self, name: str) -> "Ctx":
        raise NotImplementedError

    def obj_entries_factory(self):
        """Returns (keys_array, (key)->Ctx) for patternProperties-style loops,
        or None when unsupported (flat path handles these statically)."""
        return None

    # --- equality & rendering -----------------------------------------
    def eq_const(self, value) -> Cond:
        """Deep structural equality to a python JSON constant
        (AssertionEqual, evaluator_dispatch.h:697-712)."""
        raise NotImplementedError

    def json_repr(self) -> Column:
        """Stringified JSON of the value, for error messages
        (describe_stringify)."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Flat path: instance = the DataFrame row, properties = typed columns
# ---------------------------------------------------------------------------


def _dtype_tag(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.StringType, T.TimestampType, T.DateType, T.BinaryType)):
        # timestamps/dates surface as their RFC 3339 string rendering;
        # binary surfaces as its base64 string rendering
        return "string"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dt, T.NullType):
        return "null"
    return "string"


class MissingCtx(Ctx):
    """A property that statically does not exist (no such column)."""

    def __init__(self, loc: Union[str, Column]):
        self.loc = loc
        self.present: Cond = False

    def tag(self):
        return "null"

    def is_type(self, t: str) -> Cond:
        return False

    def eq_const(self, value) -> Cond:
        return False

    def json_repr(self) -> Column:
        return F.lit("null")


class FlatColCtx(Ctx):
    """A single typed column viewed as a JSON value."""

    def __init__(self, col: Column, dtype: T.DataType, loc: Union[str, Column]):
        self.col = col
        self.dtype = dtype
        self.loc = loc
        self.present = col.isNotNull()
        self._tag = _dtype_tag(dtype)

    def tag(self):
        return self._tag

    def is_type(self, t: str) -> Cond:
        if t == self._tag:
            return True
        if t == "number" and self._tag == "integer":
            return True
        if t == "integer" and self._tag == "number":
            # real with zero fraction counts as integer
            d = self.col.cast("double")
            return d == F.floor(d).cast("double")
        return False

    def str_val(self) -> Column:
        if isinstance(self.dtype, T.TimestampType):
            return F.date_format(self.col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if isinstance(self.dtype, T.DateType):
            return F.date_format(self.col, "yyyy-MM-dd")
        if isinstance(self.dtype, T.BinaryType):
            return F.base64(self.col)
        return self.col.cast("string")

    def num_val(self) -> Column:
        return self.col.cast("double")

    def bool_val(self) -> Column:
        return self.col.cast("boolean")

    def arr(self) -> Column:
        return self.col

    def element_ctx_factory(self):
        et = self.dtype.elementType if isinstance(self.dtype, T.ArrayType) else T.StringType()
        loc = self.loc

        def factory(x: Column, i: Column) -> Ctx:
            return FlatColCtx(x, et, F.concat(S(loc), F.lit("/"), i.cast("string")))

        return factory

    def obj_keys(self) -> Column:
        if isinstance(self.dtype, T.MapType):
            return F.map_keys(self.col)
        if isinstance(self.dtype, T.StructType):
            return F.filter(
                F.array(*[F.when(self.col.getField(f.name).isNotNull(), F.lit(f.name)) for f in self.dtype.fields]),
                lambda x: x.isNotNull(),
            )
        return F.array()

    def get_prop(self, name: str) -> Ctx:
        child_loc = _child_loc(self.loc, name)
        if isinstance(self.dtype, T.StructType):
            names = {f.name: f for f in self.dtype.fields}
            if name not in names:
                return MissingCtx(child_loc)
            return FlatColCtx(self.col.getField(name), names[name].dataType, child_loc)
        if isinstance(self.dtype, T.MapType):
            return FlatColCtx(F.element_at(self.col, F.lit(name)), self.dtype.valueType, child_loc)
        return MissingCtx(child_loc)

    def eq_const(self, value) -> Cond:
        if value is None:
            return self._tag == "null" if isinstance(self._tag, str) else False
        if isinstance(value, bool):
            return self.bool_val() == F.lit(value) if self._tag == "boolean" else False
        if isinstance(value, (int, float)):
            if self._tag == "integer" and isinstance(value, int):
                # exact int64 compare — the double path collides values
                # beyond 2^53 (AssertionEqual is exact, dispatch.h:697)
                return self.col.cast("long") == F.lit(value)
            if self._tag in ("integer", "number"):
                return self.num_val() == F.lit(float(value))
            return False
        if isinstance(value, str):
            return self.str_val() == F.lit(value) if self._tag == "string" else False
        # arrays/objects: deep structural equality via canonical rendering
        # (key order irrelevant, 1 == 1.0 — evaluator_dispatch.h:697-712);
        # pudf slow path, containers only
        if self._tag in ("array", "object"):
            from jsonschema_spark.functions.canonical import canonical_dumps, canonical_json

            return canonical_json(F.to_json(self.col)) == F.lit(canonical_dumps(value))
        return False

    def json_repr(self) -> Column:
        if self._tag == "string":
            return json_escape_col(self.str_val())
        if self._tag == "boolean":
            return self.col.cast("string")
        if self._tag in ("integer", "number"):
            return self.col.cast("string")
        if self._tag in ("array", "object"):
            return F.to_json(self.col)
        return F.lit("null")


def _child_loc(loc: Union[str, Column], name: str) -> Union[str, Column]:
    # JSON Pointer escaping per RFC 6901
    token = name.replace("~", "~0").replace("/", "~1")
    if isinstance(loc, str):
        return f"{loc}/{token}"
    return F.concat(loc, F.lit("/" + token))


class FlatRowCtx(Ctx):
    """The whole row as a JSON object; properties = DataFrame columns."""

    def __init__(self, schema: T.StructType, colf: Callable[[str], Column] = F.col):
        self.schema = schema
        self.fields = {f.name: f for f in schema.fields}
        self.colf = colf
        self.loc = ""
        self.present: Cond = True

    def tag(self):
        return "object"

    def is_type(self, t: str) -> Cond:
        return t == "object"

    # The row is statically an object, so every scalar/array keyword guard
    # (is_type(...) != "object") is the Python literal False and _guarded
    # discards the leaf — these accessors only exist so the leaf expression
    # can be *built* before being thrown away (e.g. a root-level multipleOf).
    def str_val(self) -> Column:
        return F.lit(None).cast("string")

    def num_val(self) -> Column:
        return F.lit(None).cast("double")

    def bool_val(self) -> Column:
        return F.lit(None).cast("boolean")

    def arr(self) -> Column:
        return F.lit(None).cast("array<string>")

    def obj_keys(self) -> Column:
        return F.filter(
            F.array(*[F.when(self.colf(n).isNotNull(), F.lit(n)) for n in self.fields]),
            lambda x: x.isNotNull(),
        )

    def get_prop(self, name: str) -> Ctx:
        if name not in self.fields:
            return MissingCtx(_child_loc("", name))
        f = self.fields[name]
        return FlatColCtx(self.colf(name), f.dataType, _child_loc("", name))

    def prop_names(self) -> list[str]:
        return list(self.fields)

    def eq_const(self, value) -> Cond:
        if not isinstance(value, dict):
            return False
        conds: list[Cond] = []
        for name in self.fields:
            child = self.get_prop(name)
            if name in value:
                conds.append(or_(not_(B(child.present)), child.eq_const(value[name])))
                conds.append(B(child.present) if value[name] is not None else True)
            else:
                conds.append(not_(B(child.present)))
        for k in value:
            if k not in self.fields:
                return False
        return and_(*conds)

    def json_repr(self) -> Column:
        return F.to_json(F.struct(*[self.colf(n).alias(n) for n in self.fields]))


# ---------------------------------------------------------------------------
# Tree path: instance = a VARIANT value (parsed JSON document)
# ---------------------------------------------------------------------------

_TAG_WHEN = [
    ("OBJECT", "object"),
    ("ARRAY", "array"),
    ("STRING", "string"),
    ("BOOLEAN", "boolean"),
    ("BIGINT", "integer"),
    ("INT", "integer"),
    ("SMALLINT", "integer"),
    ("TINYINT", "integer"),
    ("VOID", "null"),
]


class VariantCtx(Ctx):
    """A VARIANT value (Spark 4) viewed as a JSON value.

    ``schema_of_variant`` yields a per-row type string (BIGINT, STRING,
    DOUBLE, DECIMAL(p,s), BOOLEAN, VOID, OBJECT<...>, ARRAY<...>); we map it
    onto the reference's 7 JSON type names. DECIMAL/DOUBLE/FLOAT → 'number'.
    """

    def __init__(self, v: Column, loc: Union[str, Column], present: Cond | None = None):
        self.v = v
        self.loc = loc
        self.present = v.isNotNull() if present is None else present

    def _schema_str(self) -> Column:
        return F.schema_of_variant(self.v)

    def tag(self) -> Column:
        s = self._schema_str()
        out = F.lit("number")  # DOUBLE / FLOAT / DECIMAL fall through
        expr = None
        for prefix, name in _TAG_WHEN:
            cond = s.startswith(prefix)
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        return expr.otherwise(out)

    def is_type(self, t: str) -> Cond:
        s = self._schema_str()
        if t == "object":
            return s.startswith("OBJECT")
        if t == "array":
            return s.startswith("ARRAY")
        if t == "string":
            return s == F.lit("STRING")
        if t == "boolean":
            return s == F.lit("BOOLEAN")
        if t == "null":
            return s == F.lit("VOID")
        is_int = (
            s.startswith("BIGINT") | s.startswith("INT") | s.startswith("SMALLINT") | s.startswith("TINYINT")
        )
        is_num = is_int | s.startswith("DOUBLE") | s.startswith("FLOAT") | s.startswith("DECIMAL")
        if t == "number":
            return is_num
        if t == "integer":
            d = self.num_val()
            return is_int | (is_num & (d == F.floor(d).cast("double")))
        raise ValueError(f"unknown type {t}")

    def str_val(self) -> Column:
        return F.try_variant_get(self.v, "$", "string")

    def num_val(self) -> Column:
        return F.try_variant_get(self.v, "$", "double")

    def bool_val(self) -> Column:
        return F.try_variant_get(self.v, "$", "boolean")

    def arr(self) -> Column:
        return F.try_variant_get(self.v, "$", "array<variant>")

    def element_ctx_factory(self):
        loc = self.loc

        def factory(x: Column, i: Column) -> Ctx:
            return VariantCtx(x, F.concat(S(loc), F.lit("/"), i.cast("string")))

        return factory

    def _as_map(self) -> Column:
        return F.try_variant_get(self.v, "$", "map<string,variant>")

    def obj_keys(self) -> Column:
        return F.map_keys(self._as_map())

    def get_prop(self, name: str) -> Ctx:
        child_loc = _child_loc(self.loc, name)
        if all(c in _IDENT_SAFE for c in name) and name and not name[0].isdigit():
            child = F.try_variant_get(self.v, f"$.{name}", "variant")
        else:
            child = F.element_at(self._as_map(), F.lit(name))
        return VariantCtx(child, child_loc)

    def obj_entries_factory(self):
        m = self._as_map()
        loc = self.loc

        def prop_ctx(key: Column) -> Ctx:
            return VariantCtx(F.element_at(m, key), F.concat(S(loc), F.lit("/"), key))

        return F.map_keys(m), prop_ctx

    def eq_const(self, value) -> Cond:
        if value is None:
            return self.is_type("null")
        if isinstance(value, bool):
            return self.is_type("boolean") & (self.bool_val() == F.lit(value))
        if isinstance(value, int):
            # exact int64 equality for integer-tagged instances; a REAL
            # instance equals an int constant only when the constant is
            # exactly double-representable (reference cross-type numeric
            # compare is exact)
            s = self._schema_str()
            is_int = (
                s.startswith("BIGINT") | s.startswith("INT")
                | s.startswith("SMALLINT") | s.startswith("TINYINT")
            )
            long_eq = is_int & (F.try_variant_get(self.v, "$", "bigint") == F.lit(value))
            try:
                as_double = float(value)
                representable = int(as_double) == value
            except OverflowError:
                representable = False
            if not representable:
                return long_eq
            is_real = s.startswith("DOUBLE") | s.startswith("FLOAT") | s.startswith("DECIMAL")
            return long_eq | (is_real & (self.num_val() == F.lit(as_double)))
        if isinstance(value, float):
            return B(self.is_type("number")) & (self.num_val() == F.lit(float(value)))
        if isinstance(value, str):
            return B(self.is_type("string")) & (self.str_val() == F.lit(value))
        # containers: deep structural equality via canonical rendering —
        # variant to_json preserves source key order, so the raw string
        # compare would wrongly distinguish {"a":1,"b":2} from its
        # reordering (reference deep equality: equal)
        from jsonschema_spark.functions.canonical import canonical_dumps, canonical_json

        return canonical_json(F.to_json(self.v)) == F.lit(canonical_dumps(value))

    def json_repr(self) -> Column:
        return F.to_json(self.v)
