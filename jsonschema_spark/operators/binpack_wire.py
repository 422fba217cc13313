"""Byte-exact JSON BinPack schema-less wire codec.

Pure-Python mirror of the reference CLI's `jsonschema encode`/`decode`
schema-less path — the ANY_PACKED_TYPE_TAG_BYTE_PREFIX encoding of
vendored JSON BinPack:

- tag layout / type+subtype constants:
  /root/reference/vendor/jsonbinpack/src/runtime/include/sourcemeta/
  jsonbinpack/runtime_encoding.h:404-437
- encoder: vendor/jsonbinpack/src/runtime/encoder_any.cc:73-207,
  encoder_string.cc (FLOOR_VARINT_PREFIX_UTF8_STRING_SHARED,
  PREFIX_VARINT_LENGTH_STRING_SHARED), encoder_number.cc
  (DOUBLE_VARINT_TUPLE), encoder_object.cc, output_stream.cc (LEB128
  varint, zigzag)
- decoder: decoder_any.cc, decoder_string.cc, decoder_number.cc,
  input_stream.cc (rewind/seek back-references)
- shared-string cache semantics: cache.cc (3-byte minimum, 20 MiB
  cap with oldest-offset eviction, offset bumping on re-record)
- real → (digits, point) decomposition: vendor/core/src/lang/numeric/
  include/sourcemeta/core/numeric_util.h:320-354 (correct_ieee754 +
  real_digits)

The reference CLI writes NO header: a .json input is one ANY value,
a .jsonl input is the concatenation of its rows through ONE encoder
(so repeated keys/strings become back-references across rows —
command_encode.cc:52-75). ``encode_values``/``decode_values`` mirror
exactly that framing; goldens from /root/reference/test/encode/ are
byte-matched in tests/test_binpack_wire.py.

This codec is the byte-parity path; ``operators/binpack.py`` keeps the
schema-driven planner and the Spark DataFrame surface (this module
plugs in as its ``wire='reference'`` option).
"""
from __future__ import annotations

import math
from typing import Any, Iterable, Optional

UINT5_MAX = 31  # sourcemeta::core::uint_max<5>

# runtime_encoding.h ANY_PACKED_TYPE_TAG_BYTE_PREFIX constants
TYPE_SIZE = 3
TYPE_SHARED_STRING = 0b000
TYPE_STRING = 0b001
TYPE_LONG_STRING = 0b010
TYPE_OBJECT = 0b011
TYPE_ARRAY = 0b100
TYPE_POSITIVE_INTEGER_BYTE = 0b101
TYPE_NEGATIVE_INTEGER_BYTE = 0b110
TYPE_OTHER = 0b111

SUBTYPE_FALSE = 0
SUBTYPE_TRUE = 1
SUBTYPE_NULL = 2
SUBTYPE_POSITIVE_INTEGER = 3
SUBTYPE_NEGATIVE_INTEGER = 4
SUBTYPE_NUMBER = 5
SUBTYPE_POSITIVE_REAL_INTEGER_BYTE = 6
SUBTYPE_LONG_STRING_BASE_EXPONENT_7 = 7
SUBTYPE_LONG_STRING_BASE_EXPONENT_10 = 10

# cache.cc
CACHE_MINIMUM_STRING_LENGTH = 3
CACHE_MAXIMUM_BYTE_SIZE = 20971520

STANDALONE = 0
PREFIX_LENGTH_VARINT_PLUS_ONE = 1


def _zigzag(value: int) -> int:
    return (value << 1) if value >= 0 else ((-value) << 1) - 1


def _unzigzag(value: int) -> int:
    return (value >> 1) if value % 2 == 0 else -((value + 1) >> 1)


def real_digits(value: float) -> tuple[int, int]:
    """numeric_util.h:339-354 — integer digits + decimal point position
    of a finite double, with the correct_ieee754 drift correction at
    each base-10 shift."""
    def correct(v: float) -> float:
        threshold = 0.000000001
        base = math.floor(v)
        if (base + 1) - v <= threshold:
            return float(base + 1)
        if v - base <= threshold:
            return float(base)
        return v

    shifts = 0
    frac, integral = math.modf(value)
    while frac != 0.0:
        value *= 10
        shifts += 1
        frac, integral = math.modf(correct(value))
    return int(math.floor(integral)), shifts


class _Cache:
    """cache.cc — (value, type) -> offset with oldest-offset eviction
    and offset bumping on duplicate record."""

    def __init__(self) -> None:
        self.data: dict[tuple[str, int], int] = {}
        self.order: dict[int, tuple[str, int]] = {}
        self.byte_size = 0

    def record(self, value: str, offset: int, type_: int) -> None:
        size = len(value.encode("utf-8"))
        if size < CACHE_MINIMUM_STRING_LENGTH or \
                size >= CACHE_MAXIMUM_BYTE_SIZE:
            return
        while self.data and \
                self.byte_size + size >= CACHE_MAXIMUM_BYTE_SIZE:
            oldest = min(self.order)
            key = self.order.pop(oldest)
            self.byte_size -= len(key[0].encode("utf-8"))
            del self.data[key]
        key = (value, type_)
        if key not in self.data:
            self.data[key] = offset
            self.byte_size += size
            self.order[offset] = key
        elif offset > self.data[key]:
            del self.order[self.data[key]]
            self.data[key] = offset
            self.order[offset] = key

    def find(self, value: str, type_: int) -> Optional[int]:
        return self.data.get((value, type_))


class WireEncoder:
    """One encoder = one output stream + one shared-string cache (the
    CLI constructs exactly one per output file)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cache = _Cache()

    def position(self) -> int:
        return len(self.out)

    def put_byte(self, b: int) -> None:
        self.out.append(b & 0xFF)

    def put_varint(self, value: int) -> None:
        while value > 0x7F:
            self.put_byte((value & 0x7F) | 0x80)
            value >>= 7
        self.put_byte(value)

    def put_string_utf8(self, raw: bytes) -> None:
        self.out += raw

    # encoder_string.cc:118-151
    def _key(self, value: str) -> None:
        shared = self.cache.find(value, PREFIX_LENGTH_VARINT_PLUS_ONE)
        if shared is not None:
            new_offset = self.position()
            self.put_byte(0)
            self.put_varint(self.position() - shared)
            self.cache.record(value, new_offset,
                              PREFIX_LENGTH_VARINT_PLUS_ONE)
        else:
            raw = value.encode("utf-8")
            self.cache.record(value, self.position(),
                              PREFIX_LENGTH_VARINT_PLUS_ONE)
            self.put_varint(len(raw) + 1)
            self.cache.record(value, self.position(), STANDALONE)
            self.put_string_utf8(raw)

    # encoder_string.cc:17-41 (options.minimum = 62 on the ANY path)
    def _floor_string(self, value: str, minimum: int) -> None:
        raw = value.encode("utf-8")
        shared = self.cache.find(value, STANDALONE)
        if shared is not None:
            self.put_byte(0)
        self.put_varint(len(raw) - minimum + 1)
        if shared is not None:
            self.put_varint(self.position() - shared)
        else:
            self.cache.record(value, self.position(), STANDALONE)
            self.put_string_utf8(raw)

    def write_any(self, doc: Any) -> None:
        """encoder_any.cc:73-207 ANY_PACKED_TYPE_TAG_BYTE_PREFIX."""
        t = TYPE_SIZE
        if doc is None:
            self.put_byte(TYPE_OTHER | (SUBTYPE_NULL << t))
        elif isinstance(doc, bool):
            sub = SUBTYPE_TRUE if doc else SUBTYPE_FALSE
            self.put_byte(TYPE_OTHER | (sub << t))
        elif isinstance(doc, float) and doc.is_integer():
            value = int(doc)
            if 0 <= value <= 255:
                self.put_byte(
                    TYPE_OTHER | (SUBTYPE_POSITIVE_REAL_INTEGER_BYTE << t))
                self.put_byte(value)
            else:
                self.put_byte(TYPE_OTHER | (SUBTYPE_NUMBER << t))
                self._double_varint_tuple(doc)
        elif isinstance(doc, float):
            self.put_byte(TYPE_OTHER | (SUBTYPE_NUMBER << t))
            self._double_varint_tuple(doc)
        elif isinstance(doc, int):
            positive = doc >= 0
            absolute = doc if positive else (-doc) - 1
            if absolute <= 255:
                type_ = (TYPE_POSITIVE_INTEGER_BYTE if positive
                         else TYPE_NEGATIVE_INTEGER_BYTE)
                if absolute < UINT5_MAX:
                    self.put_byte(type_ | ((absolute + 1) << t))
                else:
                    self.put_byte(type_)
                    self.put_byte(absolute)
            else:
                sub = (SUBTYPE_POSITIVE_INTEGER if positive
                       else SUBTYPE_NEGATIVE_INTEGER)
                self.put_byte(TYPE_OTHER | (sub << t))
                self.put_varint(absolute)
        elif isinstance(doc, str):
            raw = doc.encode("utf-8")
            size = len(raw)
            shared = self.cache.find(doc, STANDALONE)
            if size < UINT5_MAX:
                type_ = (TYPE_SHARED_STRING if shared is not None
                         else TYPE_STRING)
                self.put_byte(type_ | ((size + 1) << t))
                if shared is not None:
                    self.put_varint(self.position() - shared)
                else:
                    self.cache.record(doc, self.position(), STANDALONE)
                    self.put_string_utf8(raw)
            elif UINT5_MAX <= size < UINT5_MAX * 2 and shared is None:
                self.put_byte(TYPE_LONG_STRING | ((size - UINT5_MAX) << t))
                self.put_string_utf8(raw)
            elif size >= (2 << (SUBTYPE_LONG_STRING_BASE_EXPONENT_7 - 1)) \
                    and shared is None:
                exponent = min(SUBTYPE_LONG_STRING_BASE_EXPONENT_10,
                               max(SUBTYPE_LONG_STRING_BASE_EXPONENT_7,
                                   size.bit_length() - 1))
                self.put_byte(TYPE_OTHER | (exponent << t))
                self.put_varint(size - (2 << (exponent - 1)))
                self.put_string_utf8(raw)
            else:
                # shared strings start with the impossible length
                # marker 0, sparing the extra tag (encoder_any.cc:155)
                if shared is None:
                    self.put_byte(TYPE_STRING)
                self._floor_string(doc, UINT5_MAX * 2)
        elif isinstance(doc, list):
            size = len(doc)
            if size >= UINT5_MAX:
                self.put_byte(TYPE_ARRAY)
                self.put_varint(size - UINT5_MAX)
            else:
                self.put_byte(TYPE_ARRAY | ((size + 1) << t))
            for element in doc:
                self.write_any(element)
        elif isinstance(doc, dict):
            size = len(doc)
            if size >= UINT5_MAX:
                self.put_byte(TYPE_OBJECT)
                self.put_varint(size - UINT5_MAX)
            else:
                self.put_byte(TYPE_OBJECT | ((size + 1) << t))
            for key, value in doc.items():
                self._key(key)
                self.write_any(value)
        else:
            raise TypeError(f"not a JSON value: {type(doc)}")

    def _double_varint_tuple(self, value: float) -> None:
        digits, point = real_digits(value)
        self.put_varint(_zigzag(digits))
        self.put_varint(point)


class WireDecoder:
    """decoder_any.cc / decoder_string.cc / input_stream.cc mirror."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def has_more_data(self) -> bool:
        return self.pos < len(self.data)

    def get_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def get_varint(self) -> int:
        result = 0
        shift = 0
        while True:
            b = self.get_byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7

    def get_string_utf8(self, length: int) -> str:
        raw = self.data[self.pos:self.pos + length]
        if len(raw) != length:
            raise ValueError("truncated binpack string")
        self.pos += length
        return raw.decode("utf-8")

    def _rewind_read_string(self, length: int) -> str:
        # input_stream.cc:14-22 — back-reference is relative to the
        # position BEFORE reading the offset varint
        position = self.pos
        offset_back = self.get_varint()
        current = self.pos
        self.pos = position - offset_back
        value = self.get_string_utf8(length)
        self.pos = current
        return value

    def _key(self) -> str:
        prefix = self.get_varint()
        if prefix == 0:
            position = self.pos
            offset_back = self.get_varint()
            current = self.pos
            self.pos = position - offset_back
            value = self._key()
            self.pos = current
            return value
        return self.get_string_utf8(prefix - 1)

    def _floor_string(self, minimum: int) -> str:
        prefix = self.get_varint()
        if prefix == 0:
            length = self.get_varint() + minimum - 1
            return self._rewind_read_string(length)
        return self.get_string_utf8(prefix + minimum - 1)

    def read_any(self) -> Any:
        byte = self.get_byte()
        type_ = byte & (0xFF >> 5)
        subtype = byte >> TYPE_SIZE
        if type_ == TYPE_OTHER:
            if subtype == SUBTYPE_NULL:
                return None
            if subtype == SUBTYPE_FALSE:
                return False
            if subtype == SUBTYPE_TRUE:
                return True
            if subtype == SUBTYPE_NUMBER:
                digits = _unzigzag(self.get_varint())
                point = self.get_varint()
                divisor = 1.0
                for _ in range(point):
                    divisor *= 10.0
                return float(digits) / divisor
            if subtype == SUBTYPE_POSITIVE_REAL_INTEGER_BYTE:
                return float(self.get_byte())
            if subtype == SUBTYPE_POSITIVE_INTEGER:
                return self.get_varint()
            if subtype == SUBTYPE_NEGATIVE_INTEGER:
                return -self.get_varint() - 1
            if SUBTYPE_LONG_STRING_BASE_EXPONENT_7 <= subtype <= \
                    SUBTYPE_LONG_STRING_BASE_EXPONENT_10:
                length = self.get_varint() + (2 << (subtype - 1))
                return self.get_string_utf8(length)
            raise ValueError(f"bad binpack subtype {subtype}")
        if type_ == TYPE_POSITIVE_INTEGER_BYTE:
            return subtype - 1 if subtype > 0 else self.get_byte()
        if type_ == TYPE_NEGATIVE_INTEGER_BYTE:
            return -subtype if subtype > 0 else -self.get_byte() - 1
        if type_ == TYPE_SHARED_STRING:
            length = (self.get_varint() - 1 + UINT5_MAX * 2
                      if subtype == 0 else subtype - 1)
            return self._rewind_read_string(length)
        if type_ == TYPE_STRING:
            if subtype == 0:
                return self._floor_string(UINT5_MAX * 2)
            return self.get_string_utf8(subtype - 1)
        if type_ == TYPE_LONG_STRING:
            return self.get_string_utf8(subtype + UINT5_MAX)
        if type_ == TYPE_ARRAY:
            size = (self.get_varint() + UINT5_MAX if subtype == 0
                    else subtype - 1)
            return [self.read_any() for _ in range(size)]
        if type_ == TYPE_OBJECT:
            size = (self.get_varint() + UINT5_MAX if subtype == 0
                    else subtype - 1)
            out = {}
            for _ in range(size):
                key = self._key()
                out[key] = self.read_any()
            return out
        raise ValueError(f"bad binpack type {type_}")


def encode_values(docs: Iterable[Any]) -> bytes:
    """The CLI's exact output framing: all values through ONE encoder
    (one .json document, or a .jsonl file's rows in order) — shared
    strings back-reference across values, no header, no separators."""
    enc = WireEncoder()
    for doc in docs:
        enc.write_any(doc)
    return bytes(enc.out)


def decode_values(data: bytes) -> list[Any]:
    """Inverse of encode_values: read ANY values until exhaustion (the
    CLI's decode loop over a .binpack file)."""
    dec = WireDecoder(data)
    out = []
    while dec.has_more_data():
        out.append(dec.read_any())
    return out


def encode_report(original_size: int, encoded_size: int) -> str:
    """The CLI's stderr summary, byte-matched to the encode goldens
    (integer-division percentage, command_encode.cc)."""
    return (f"original file size: {original_size} bytes\n"
            f"encoded file size: {encoded_size} bytes\n"
            f"compression ratio: {encoded_size * 100 // original_size}%\n")
