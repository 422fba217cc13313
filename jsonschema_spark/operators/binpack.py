"""Schema-driven + schema-less compact binary codec — the `encode` /
`decode` command analogue.

The reference encodes JSON documents with JSON BinPack
(/root/reference/src/command_encode.cc, command_decode.cc; vendored
engine vendor/jsonbinpack/) — a schema-driven binary format whose core
idea is that schema constraints shrink the wire form: a `const` costs 0
bytes, a small `enum` one index byte, a bounded integer its offset, a
closed object nothing but its values in canonical key order. The CLI's
own mode is the schema-less fallback (tagged values). Both modes are
re-expressed here over Spark binary columns. The schema-DRIVEN layout
is a version-local contract between THIS module's encode and decode
(like the reference's own "output might not be decodable across
versions" warning); the schema-LESS path additionally ships a
BYTE-EXACT mirror of the reference's ANY_PACKED_TYPE_TAG_BYTE_PREFIX
wire (``wire='reference'`` here; ``operators/binpack_wire.py``,
golden-matched against /root/reference/test/encode/).

Wire primitives (documented, version-local):
- varint   = LEB128 unsigned little-endian, 7 bits per byte
- zigzag   = (n << 1) ^ (n >> 63) signed mapping, then varint
- decimal  = zigzag(mantissa) varint + varint(scale); value = m * 10^-s
  (floats stay exact for the decimal literals JSON carries)
- strings  = varint byte-length prefix + UTF-8

Schema-driven plans (chosen by ``encoding_plan``, reference encoding
names in comments): the per-row codec runs as an Arrow-batched pandas
UDF inside ``encode_df``/``decode_df`` — Python is unavoidable for a
byte-level codec, so it is batched, never row-at-a-time over Python
RPC. At scale the codec is embarrassingly parallel (no shuffle; one
narrow projection per partition).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BinaryType, StringType

from jsonschema_spark.functions.canonical import canonical_dumps

# --- wire primitives ---------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _zigzag(n: int) -> int:
    return 2 * n if n >= 0 else -2 * n - 1


def _unzigzag(z: int) -> int:
    return z // 2 if z % 2 == 0 else -(z + 1) // 2


def _enc_decimal(x: float) -> bytes:
    # exact round-trip via shortest-repr digits: value = mantissa * 10^-scale
    s = repr(float(x))
    if "e" in s:
        m, _, e = s.partition("e")
        mant = int(m.replace(".", ""))
        scale = len(m.partition(".")[2]) - int(e)
        return _varint(_zigzag(mant)) + _varint(_zigzag(scale))
    whole, _, frac = s.partition(".")
    frac = frac.rstrip("0")
    mant = int(whole + frac) if whole + frac not in ("", "-") else 0
    return _varint(_zigzag(mant)) + _varint(_zigzag(len(frac)))


def _dec_decimal(buf: bytes, pos: int) -> tuple[float, int]:
    zm, pos = _read_varint(buf, pos)
    zs, pos = _read_varint(buf, pos)
    m, s = _unzigzag(zm), _unzigzag(zs)
    return float(f"{m}e{-s}"), pos


# --- schema-less mode (ANY_PACKED_TYPE_TAG_BYTE_PREFIX analogue) -------------
# tag byte: low 3 bits = type, high 5 bits = small value/length + 1
# (0 ⇒ a varint follows). types: 0 null, 1 false, 2 true, 3 int,
# 4 number, 5 string, 6 array, 7 object.

_T_NULL, _T_FALSE, _T_TRUE, _T_INT, _T_NUM, _T_STR, _T_ARR, _T_OBJ = range(8)


def _tag(t: int, small: int) -> bytes:
    return bytes([t | (small << 3)])


def _enc_any(v, out: bytearray) -> None:
    if v is None:
        out += _tag(_T_NULL, 0)
    elif isinstance(v, bool):
        out += _tag(_T_TRUE if v else _T_FALSE, 0)
    elif isinstance(v, int):
        z = _zigzag(v)
        if z < 31:
            out += _tag(_T_INT, z + 1)
        else:
            out += _tag(_T_INT, 0) + _varint(z)
    elif isinstance(v, float):
        out += _tag(_T_NUM, 0) + _enc_decimal(v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) < 31:
            out += _tag(_T_STR, len(b) + 1) + b
        else:
            out += _tag(_T_STR, 0) + _varint(len(b)) + b
    elif isinstance(v, list):
        if len(v) < 31:
            out += _tag(_T_ARR, len(v) + 1)
        else:
            out += _tag(_T_ARR, 0) + _varint(len(v))
        for x in v:
            _enc_any(x, out)
    elif isinstance(v, dict):
        if len(v) < 31:
            out += _tag(_T_OBJ, len(v) + 1)
        else:
            out += _tag(_T_OBJ, 0) + _varint(len(v))
        for k, x in v.items():
            kb = k.encode("utf-8")
            out += _varint(len(kb)) + kb
            _enc_any(x, out)
    else:
        raise TypeError(f"not a JSON value: {type(v)}")


def _dec_any(buf: bytes, pos: int):
    t = buf[pos] & 7
    small = buf[pos] >> 3
    pos += 1
    if t == _T_NULL:
        return None, pos
    if t == _T_FALSE:
        return False, pos
    if t == _T_TRUE:
        return True, pos
    if t == _T_INT:
        z = small - 1 if small else None
        if z is None:
            z, pos = _read_varint(buf, pos)
        return _unzigzag(z), pos
    if t == _T_NUM:
        return _dec_decimal(buf, pos)
    if t == _T_STR:
        n = small - 1 if small else None
        if n is None:
            n, pos = _read_varint(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if t == _T_ARR:
        n = small - 1 if small else None
        if n is None:
            n, pos = _read_varint(buf, pos)
        out = []
        for _ in range(n):
            x, pos = _dec_any(buf, pos)
            out.append(x)
        return out, pos
    n = small - 1 if small else None
    if n is None:
        n, pos = _read_varint(buf, pos)
    obj = {}
    for _ in range(n):
        kl, pos = _read_varint(buf, pos)
        k = buf[pos:pos + kl].decode("utf-8")
        pos += kl
        obj[k], pos = _dec_any(buf, pos)
    return obj, pos


# --- schema-driven plans -----------------------------------------------------


@dataclass(frozen=True)
class Plan:
    kind: str  # const | enum | bounded_int | floor_int | roof_int | int |
    #            number | string | boolean | null | object | array | any
    const: object = None
    choices: tuple = ()
    lo: int = 0
    hi: int = 0
    mult: int = 1
    props: tuple = ()        # ((name, Plan, required), ...) sorted by name
    extras: bool = False     # additionalProperties allowed (schema-less tail)
    items: Optional["Plan"] = None
    prefix: tuple = ()
    fixed_n: int = -1        # minItems == maxItems ⇒ no length prefix


def encoding_plan(schema: Union[dict, bool]) -> Plan:
    """Choose a wire codec per schema node (the jsonbinpack *compiler*
    analogue, vendor/jsonbinpack/src/compiler — encoding names inline)."""
    if schema is True or schema == {} or not isinstance(schema, dict):
        return Plan("any")
    if "const" in schema:
        return Plan("const", const=schema["const"])  # CONST_NONE: 0 bytes
    if isinstance(schema.get("enum"), list) and schema["enum"]:
        return Plan("enum", choices=tuple(canonical_dumps(v) for v in schema["enum"]))
        # BYTE_CHOICE_INDEX / LARGE_CHOICE_INDEX
    t = schema.get("type")
    if t == "integer":
        lo, hi = schema.get("minimum"), schema.get("maximum")
        mult = schema.get("multipleOf", 1)
        mult = int(mult) if isinstance(mult, (int, float)) and float(mult).is_integer() and mult >= 1 else 1
        if mult > 1:
            # multipleOf constrains v % mult == 0, NOT (v - lo) % mult == 0:
            # snap the bounds to the multiple so offset = (v - lo) / mult is
            # exact for every schema-valid v (mirrors the reference's
            # FLOOR_MULTIPLE_ENUM_VARINT arithmetic, which offsets from the
            # smallest multiple >= minimum)
            if isinstance(lo, int) and not isinstance(lo, bool):
                lo = -((-lo) // mult) * mult   # ceil to next multiple
            if isinstance(hi, int) and not isinstance(hi, bool):
                hi = (hi // mult) * mult       # floor to prev multiple
        if isinstance(lo, int) and isinstance(hi, int):
            return Plan("bounded_int", lo=lo, hi=hi, mult=mult)
            # BOUNDED_MULTIPLE_8BITS_ENUM_FIXED when range small, varint otherwise
        if isinstance(lo, int):
            return Plan("floor_int", lo=lo, mult=mult)   # FLOOR_MULTIPLE_ENUM_VARINT
        if isinstance(hi, int):
            return Plan("roof_int", hi=hi, mult=mult)    # ROOF_MULTIPLE_MIRROR_ENUM_VARINT
        return Plan("int", mult=mult)                    # ARBITRARY_MULTIPLE_ZIGZAG_VARINT
    if t == "number":
        return Plan("number")                            # DOUBLE_VARINT_TUPLE
    if t == "string":
        return Plan("string")                            # FLOOR_VARINT_PREFIX_UTF8_STRING_SHARED (no pool)
    if t == "boolean":
        return Plan("boolean")                           # BYTE_CHOICE_INDEX {false,true}
    if t == "null":
        return Plan("null")                              # CONST_NONE
    if t == "object" or "properties" in schema:
        props = schema.get("properties") or {}
        req = set(schema.get("required") or ())
        entries = tuple(
            (name, encoding_plan(sub), name in req)
            for name, sub in sorted(props.items())
        )
        extras = schema.get("additionalProperties") is not False
        if entries or not extras:
            return Plan("object", props=entries, extras=extras)
            # TYPED_PROPERTIES_OBJECT: canonical order, presence bitset
        return Plan("any")
    if t == "array" or "items" in schema or "prefixItems" in schema:
        items = schema.get("items")
        prefix = schema.get("prefixItems") or ()
        if isinstance(items, list):  # legacy tuple form
            prefix, items = items, None
        mn, mx = schema.get("minItems"), schema.get("maxItems")
        fixed = mn if isinstance(mn, int) and mn == mx else -1
        return Plan(
            "array",
            items=encoding_plan(items) if isinstance(items, (dict, bool)) else Plan("any"),
            prefix=tuple(encoding_plan(p) for p in prefix),
            fixed_n=fixed,
        )  # FIXED_TYPED_ARRAY / FLOOR_TYPED_LENGTH_PREFIX
    return Plan("any")


class EncodeError(ValueError):
    pass


def encode_value(plan: Plan, v, out: bytearray) -> None:
    k = plan.kind
    if isinstance(v, bool) and k in (
        "bounded_int", "floor_int", "roof_int", "int", "number"
    ):
        # python bool ⊂ int would silently coerce true → 1; JSON booleans
        # are NOT numbers (the instance doesn't conform to the plan)
        raise EncodeError(f"boolean {v} under a numeric encoding")
    if k == "const":
        # 0 bytes — but the instance must BE the const, else decode would
        # silently resurrect a different value
        if canonical_dumps(v) != canonical_dumps(plan.const):
            raise EncodeError(f"value {v!r} != const {plan.const!r}")
        return
    if k == "null":
        if v is not None:
            raise EncodeError(f"expected null, got {v!r}")
        return
    if k == "enum":
        try:
            out += _varint(plan.choices.index(canonical_dumps(v)))
        except ValueError:
            raise EncodeError(f"value not in enum: {v!r}")
    elif k == "bounded_int":
        off, rem = divmod(int(v) - plan.lo, plan.mult)
        if off < 0 or int(v) > plan.hi or rem:
            raise EncodeError(f"integer {v} outside [{plan.lo}, {plan.hi}] / x{plan.mult}")
        out += bytes([off]) if (plan.hi - plan.lo) // plan.mult < 256 else _varint(off)
    elif k == "floor_int":
        off, rem = divmod(int(v) - plan.lo, plan.mult)
        if off < 0 or rem:
            raise EncodeError(f"integer {v} below floor {plan.lo} / x{plan.mult}")
        out += _varint(off)
    elif k == "roof_int":
        off, rem = divmod(plan.hi - int(v), plan.mult)
        if off < 0 or rem:
            raise EncodeError(f"integer {v} above roof {plan.hi} / x{plan.mult}")
        out += _varint(off)
    elif k == "int":
        q, rem = divmod(int(v), plan.mult)
        if rem:
            raise EncodeError(f"integer {v} is not a multiple of {plan.mult}")
        out += _varint(_zigzag(q))
    elif k == "number":
        out += _enc_decimal(float(v))
    elif k == "string":
        b = str(v).encode("utf-8")
        out += _varint(len(b)) + b
    elif k == "boolean":
        out += b"\x01" if v else b"\x00"
    elif k == "object":
        if not isinstance(v, dict):
            raise EncodeError(f"expected object, got {type(v).__name__}")
        optional = [name for name, _, req in plan.props if not req]
        if optional:  # presence bitset for optionals, canonical order
            bits = 0
            for i, name in enumerate(optional):
                if name in v:
                    bits |= 1 << i
            out += _varint(bits)
        for name, sub, req in plan.props:
            if name in v:
                encode_value(sub, v[name], out)
            elif req:
                raise EncodeError(f"missing required property {name!r}")
        if plan.extras:
            known = {name for name, _, _ in plan.props}
            extras = {n: x for n, x in v.items() if n not in known}
            _enc_any(extras, out)
    elif k == "array":
        if not isinstance(v, list):
            raise EncodeError(f"expected array, got {type(v).__name__}")
        if plan.fixed_n < 0:
            out += _varint(len(v))
        elif len(v) != plan.fixed_n:
            raise EncodeError(f"expected exactly {plan.fixed_n} items")
        for i, x in enumerate(v):
            sub = plan.prefix[i] if i < len(plan.prefix) else plan.items
            encode_value(sub, x, out)
    else:  # any
        _enc_any(v, out)


def decode_value(plan: Plan, buf: bytes, pos: int):
    k = plan.kind
    if k == "const":
        return plan.const, pos
    if k == "null":
        return None, pos
    if k == "enum":
        i, pos = _read_varint(buf, pos)
        return json.loads(plan.choices[i]), pos
    if k == "bounded_int":
        if (plan.hi - plan.lo) // plan.mult < 256:
            off, pos = buf[pos], pos + 1
        else:
            off, pos = _read_varint(buf, pos)
        return plan.lo + off * plan.mult, pos
    if k == "floor_int":
        off, pos = _read_varint(buf, pos)
        return plan.lo + off * plan.mult, pos
    if k == "roof_int":
        off, pos = _read_varint(buf, pos)
        return plan.hi - off * plan.mult, pos
    if k == "int":
        z, pos = _read_varint(buf, pos)
        return _unzigzag(z) * plan.mult, pos
    if k == "number":
        return _dec_decimal(buf, pos)
    if k == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if k == "boolean":
        return buf[pos] == 1, pos + 1
    if k == "object":
        optional = [name for name, _, req in plan.props if not req]
        bits = 0
        if optional:
            bits, pos = _read_varint(buf, pos)
        present = {name for i, name in enumerate(optional) if bits & (1 << i)}
        obj = {}
        for name, sub, req in plan.props:
            if req or name in present:
                obj[name], pos = decode_value(sub, buf, pos)
        if plan.extras:
            extras, pos = _dec_any(buf, pos)
            obj.update(extras)
        return obj, pos
    if k == "array":
        if plan.fixed_n < 0:
            n, pos = _read_varint(buf, pos)
        else:
            n = plan.fixed_n
        out = []
        for i in range(n):
            sub = plan.prefix[i] if i < len(plan.prefix) else plan.items
            x, pos = decode_value(sub, buf, pos)
            out.append(x)
        return out, pos
    return _dec_any(buf, pos)


def encode_instance(value, schema: Union[dict, bool, None] = None) -> bytes:
    """One value → bytes. schema=None ⇒ schema-less mode (the CLI's)."""
    out = bytearray()
    if schema is None:
        _enc_any(value, out)
    else:
        encode_value(encoding_plan(schema), value, out)
    return bytes(out)


def decode_instance(buf: bytes, schema: Union[dict, bool, None] = None):
    if schema is None:
        v, _ = _dec_any(buf, 0)
    else:
        v, _ = decode_value(encoding_plan(schema), buf, 0)
    return v


# --- Spark operators ---------------------------------------------------------


def binpack_encode(doc_col: Column, schema: Union[dict, bool, None] = None,
                   wire: str = "local") -> Column:
    """JSON-string column → compact binary column (Arrow-batched).

    ``wire='reference'`` (schema-less only) emits the BYTE-EXACT JSON
    BinPack ANY encoding of the reference CLI (operators/binpack_wire
    — golden-matched against /root/reference/test/encode/), with one
    fresh shared-string cache PER ROW so every cell is independently
    decodable (the CLI's per-FILE cache is the ``encode_values``
    framing — use it driver-side when writing whole .binpack files).
    Default 'local' keeps this module's version-local format.
    """
    if wire not in ("local", "reference"):
        raise ValueError("wire must be local|reference")
    if wire == "reference" and schema is not None:
        raise ValueError("wire='reference' is the schema-less CLI path")
    plan = encoding_plan(schema) if schema is not None else None

    @F.pandas_udf(BinaryType())
    def _enc(s: pd.Series) -> pd.Series:
        from jsonschema_spark.operators.binpack_wire import encode_values

        def one(text):
            if text is None:
                return None
            v = json.loads(text)
            if wire == "reference":
                return encode_values([v])
            out = bytearray()
            if plan is None:
                _enc_any(v, out)
            else:
                encode_value(plan, v, out)
            return bytes(out)

        return s.map(one)

    return _enc(doc_col)


def binpack_decode(bin_col: Column, schema: Union[dict, bool, None] = None,
                   wire: str = "local") -> Column:
    """Binary column → canonical JSON-string column."""
    if wire not in ("local", "reference"):
        raise ValueError("wire must be local|reference")
    if wire == "reference" and schema is not None:
        raise ValueError("wire='reference' is the schema-less CLI path")
    plan = encoding_plan(schema) if schema is not None else None

    @F.pandas_udf(StringType())
    def _dec(s: pd.Series) -> pd.Series:
        from jsonschema_spark.operators.binpack_wire import decode_values

        def one(buf):
            if buf is None:
                return None
            if wire == "reference":
                v = decode_values(bytes(buf))[0]
            else:
                v = (_dec_any(bytes(buf), 0)[0] if plan is None
                     else decode_value(plan, bytes(buf), 0)[0])
            return canonical_dumps(v)

        return s.map(one)

    return _dec(bin_col)


def encode_df(df: DataFrame, doc_col: str, schema=None, out_col: str = "bin",
              wire: str = "local") -> DataFrame:
    return df.withColumn(out_col,
                         binpack_encode(F.col(doc_col), schema, wire=wire))


def decode_df(df: DataFrame, bin_col: str, schema=None, out_col: str = "doc",
              wire: str = "local") -> DataFrame:
    return df.withColumn(out_col,
                         binpack_decode(F.col(bin_col), schema, wire=wire))
