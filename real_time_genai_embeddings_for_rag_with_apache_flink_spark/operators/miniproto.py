"""Self-contained protobuf (proto3) WIRE-FORMAT runtime, sized to the
one place this engine needs protobuf without the ``google.protobuf``
package: Spark's ``transformWithStateInPandas`` state-API client
(``pyspark/sql/streaming/stateful_processor_api_client.py``), whose
every method lazily imports ``pyspark.sql.streaming.proto
.StateMessage_pb2`` — a generated module that cannot load without the
protobuf runtime. This module implements the PUBLIC protobuf encoding
(varints, tags, length-delimited fields — developers.google.com/
protocol-buffers/docs/encoding) and the PUBLIC descriptor.proto field
numbers, parses the serialized ``FileDescriptorProto`` embedded in the
installed pyspark's generated file, and synthesizes message classes
with the small API surface the state clients actually use:

- construction with kwargs (scalars, bytes, nested messages),
- scalar field assignment (``cmd.stateName = ...``),
- auto-vivified nested-message mutation (``cmd.ttl.durationMs = 1``),
- oneof last-set-wins clearing,
- repeated scalar/message fields,
- ``SerializeToString()`` / ``ParseFromString()``.

The bytes on the wire are ordinary protobuf — the JVM side keeps using
the real library. ``install_state_message_shim()`` registers the
synthesized module in ``sys.modules`` under the generated module's
name; it is a NO-OP whenever the real ``google.protobuf`` runtime is
importable (the real generated module always wins).

proto3 presence rules implemented: scalars serialize iff != default or
explicitly-set members of a real oneof; message fields iff present
(reading one auto-vivifies a child that only becomes present on its
first mutation — exactly the semantics ``cmd.ttl.durationMs = x``
needs); repeated fields iff non-empty. Unknown fields and packed
numeric encodings are accepted on parse.
"""

from __future__ import annotations

import struct
import sys
import types

# descriptor.proto field numbers (public, frozen by the format):
# FileDescriptorProto: package=2, message_type=4, enum_type=5
# DescriptorProto: name=1, field=2, nested_type=3, enum_type=4, oneof_decl=8
# FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6,
#                       oneof_index=9
# EnumDescriptorProto: name=1, value=2; EnumValueDescriptorProto: name=1,
#                      number=2; OneofDescriptorProto: name=1

_LABEL_REPEATED = 3

# FieldDescriptorProto.Type values (public)
T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32 = 1, 2, 3, 4, 5
T_FIXED64, T_FIXED32, T_BOOL, T_STRING, T_GROUP = 6, 7, 8, 9, 10
T_MESSAGE, T_BYTES, T_UINT32, T_ENUM = 11, 12, 13, 14
T_SFIXED32, T_SFIXED64, T_SINT32, T_SINT64 = 15, 16, 17, 18

_VARINT_TYPES = {T_INT64, T_UINT64, T_INT32, T_UINT32, T_BOOL, T_ENUM,
                 T_SINT32, T_SINT64}
_FIXED64_TYPES = {T_DOUBLE, T_FIXED64, T_SFIXED64}
_FIXED32_TYPES = {T_FLOAT, T_FIXED32, T_SFIXED32}
_LEN_TYPES = {T_STRING, T_BYTES, T_MESSAGE}


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, value: int) -> None:
    value &= (1 << 64) - 1  # negative int32/int64 -> 10-byte two's complement
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _iter_wire(buf: bytes):
    """Yield (field_number, wire_type, raw_value) triples; raw_value is
    an unsigned int for varint/fixed wire types, bytes for len-delim."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
        elif wire == 5:
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field_no, wire, val


def _to_signed(value: int, bits: int = 64) -> int:
    return value - (1 << bits) if value >= 1 << (bits - 1) else value


# ---------------------------------------------------------------------------
# descriptor model + FileDescriptorProto parser
# ---------------------------------------------------------------------------


class FieldDesc:
    __slots__ = ("name", "number", "type", "repeated", "type_name",
                 "oneof", "message_cls", "default")

    def __init__(self, name, number, ftype, repeated, type_name, oneof):
        self.name = name
        self.number = number
        self.type = ftype
        self.repeated = repeated
        self.type_name = type_name  # fully-qualified ".pkg.Msg" for messages
        self.oneof = oneof  # real oneof group name or None
        self.message_cls = None  # linked after all classes exist
        if ftype in (T_STRING,):
            self.default = ""
        elif ftype == T_BYTES:
            self.default = b""
        elif ftype == T_BOOL:
            self.default = False
        elif ftype in (T_DOUBLE, T_FLOAT):
            self.default = 0.0
        else:
            self.default = 0


class MessageDesc:
    __slots__ = ("name", "full_name", "fields", "by_number", "by_name")

    def __init__(self, name, full_name, fields):
        self.name = name
        self.full_name = full_name
        self.fields = sorted(fields, key=lambda f: f.number)
        self.by_number = {f.number: f for f in self.fields}
        self.by_name = {f.name: f for f in self.fields}


def _parse_field_desc(buf: bytes, oneof_names: list[str]) -> FieldDesc:
    name = type_name = None
    number = ftype = label = 0
    oneof_index = None
    for fn, _w, v in _iter_wire(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 3:
            number = v
        elif fn == 4:
            label = v
        elif fn == 5:
            ftype = v
        elif fn == 6:
            type_name = v.decode()
        elif fn == 9:
            oneof_index = v
    oneof = None
    if oneof_index is not None and oneof_index < len(oneof_names):
        group = oneof_names[oneof_index]
        # leading-underscore groups are synthetic (proto3 optional), not
        # mutual-exclusion oneofs
        if not group.startswith("_"):
            oneof = group
    return FieldDesc(name, number, ftype, label == _LABEL_REPEATED,
                     type_name, oneof)


def _parse_enum_desc(buf: bytes) -> tuple[str, list[tuple[str, int]]]:
    name, values = None, []
    for fn, _w, v in _iter_wire(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            vname, vnum = None, 0
            for fn2, _w2, v2 in _iter_wire(v):
                if fn2 == 1:
                    vname = v2.decode()
                elif fn2 == 2:
                    vnum = v2
            values.append((vname, vnum))
    return name, values


def _parse_message_desc(buf: bytes, prefix: str, out_messages, out_enums):
    name = None
    raw_fields, nested, enums, oneof_names = [], [], [], []
    for fn, _w, v in _iter_wire(buf):
        if fn == 1:
            name = v.decode()
        elif fn == 2:
            raw_fields.append(v)
        elif fn == 3:
            nested.append(v)
        elif fn == 4:
            enums.append(v)
        elif fn == 8:
            oneof_name = None
            for fn2, _w2, v2 in _iter_wire(v):
                if fn2 == 1:
                    oneof_name = v2.decode()
            oneof_names.append(oneof_name)
    full_name = f"{prefix}.{name}"
    fields = [_parse_field_desc(f, oneof_names) for f in raw_fields]
    out_messages.append(MessageDesc(name, full_name, fields))
    for e in enums:
        out_enums.append((full_name,) + _parse_enum_desc(e))
    for n in nested:
        _parse_message_desc(n, full_name, out_messages, out_enums)


def parse_file_descriptor(data: bytes):
    """serialized FileDescriptorProto -> (package, [MessageDesc],
    [(scope, enum_name, [(value_name, number)])])."""
    package, messages, enums = "", [], []
    for fn, _w, v in _iter_wire(data):
        if fn == 2:
            package = v.decode()
        elif fn == 4:
            _parse_message_desc(v, f".{package}", messages, enums)
        elif fn == 5:
            enums.append((f".{package}",) + _parse_enum_desc(v))
    return package, messages, enums


# ---------------------------------------------------------------------------
# dynamic message class
# ---------------------------------------------------------------------------


class MiniMessage:
    """Base for synthesized message classes; per-class descriptor in
    ``_DESC``. Instances keep set fields in ``_values``; lazily-read
    child messages become present on their first mutation via the
    ``_on_mutate`` hook chain (protobuf's placeholder semantics)."""

    _DESC: MessageDesc = None  # set by the factory

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_on_mutate", None)
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------

    def __getattr__(self, name):
        desc = type(self)._DESC.by_name.get(name)
        if desc is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        values = self._values
        if name in values:
            return values[name]
        if desc.repeated:
            container: list = []
            values[name] = container  # empty list never serializes
            return container
        if desc.type == T_MESSAGE:
            # every read of an absent submessage must return the SAME
            # placeholder (real protobuf semantics): two live references
            # from separate reads would otherwise each carry an armed
            # mutate-hook, and the later mutation would overwrite the
            # earlier child in _values, silently dropping its fields
            cached = getattr(self, "_lazy_" + name, None)
            if cached is not None:
                return cached
            child = desc.message_cls()
            parent = self

            def hook(_child=child, _name=name, _parent=parent):
                _parent._set_field(_name, _child)

            object.__setattr__(child, "_on_mutate", hook)
            # NOT stored in _values: absent until first mutation
            object.__setattr__(self, "_lazy_" + name, child)
            return child
        return desc.default

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        desc = type(self)._DESC.by_name.get(name)
        if desc is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if desc.type == T_MESSAGE and not desc.repeated and not isinstance(
            value, (desc.message_cls, type(None))
        ):
            raise TypeError(
                f"{name} expects {desc.message_cls.__name__}, "
                f"got {type(value).__name__}"
            )
        self._set_field(name, value)

    def _set_field(self, name, value):
        desc = type(self)._DESC.by_name[name]
        if desc.oneof is not None:
            for other in type(self)._DESC.fields:
                if other.oneof == desc.oneof and other.name != name:
                    self._values.pop(other.name, None)
                    # a cleared sibling's cached placeholder must not
                    # resurface with its old mutations on the next read
                    if getattr(self, "_lazy_" + other.name, None) is not None:
                        object.__setattr__(self, "_lazy_" + other.name, None)
        self._values[name] = value
        self._mutated()

    def _mutated(self):
        hook = self._on_mutate
        if hook is not None:
            object.__setattr__(self, "_on_mutate", None)
            hook()

    # -- serialization -------------------------------------------------------

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for desc in type(self)._DESC.fields:
            if desc.name not in self._values:
                continue
            value = self._values[desc.name]
            if desc.repeated:
                for item in value:
                    _encode_field(out, desc, item)
            else:
                if (
                    desc.type != T_MESSAGE
                    and desc.oneof is None
                    and value == desc.default
                ):
                    continue  # proto3 implicit presence
                if value is None:
                    continue
                _encode_field(out, desc, value)
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        by_number = type(self)._DESC.by_number
        for field_no, wire, raw in _iter_wire(data):
            desc = by_number.get(field_no)
            if desc is None:
                continue  # unknown field: skip
            if (
                desc.repeated
                and wire == 2
                and desc.type in _VARINT_TYPES | _FIXED32_TYPES | _FIXED64_TYPES
            ):
                # packed numeric encoding
                items = self._values.setdefault(desc.name, [])
                pos = 0
                while pos < len(raw):
                    if desc.type in _VARINT_TYPES:
                        v, pos = _read_varint(raw, pos)
                        items.append(_decode_numeric(desc, v))
                    elif desc.type in _FIXED32_TYPES:
                        items.append(
                            _decode_fixed(desc, int.from_bytes(raw[pos:pos + 4], "little"))
                        )
                        pos += 4
                    else:
                        items.append(
                            _decode_fixed(desc, int.from_bytes(raw[pos:pos + 8], "little"))
                        )
                        pos += 8
                continue
            value = _decode_field(desc, wire, raw)
            if desc.repeated:
                self._values.setdefault(desc.name, []).append(value)
            else:
                self._values[desc.name] = value
        return len(data)

    # -- conveniences ---------------------------------------------------------

    def HasField(self, name: str) -> bool:
        return name in self._values

    def __repr__(self):
        inner = ", ".join(
            f"{k}={v!r}" for k, v in self._values.items()
        )
        return f"{type(self).__name__}({inner})"

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.SerializeToString() == other.SerializeToString()
        )

    __hash__ = None


def _encode_field(out: bytearray, desc: FieldDesc, value) -> None:
    t = desc.type
    if t in _VARINT_TYPES:
        _write_varint(out, desc.number << 3 | 0)
        if t == T_SINT32 or t == T_SINT64:
            value = (value << 1) ^ (value >> 63)
        elif t == T_BOOL:
            value = 1 if value else 0
        _write_varint(out, int(value))
    elif t in _FIXED64_TYPES:
        _write_varint(out, desc.number << 3 | 1)
        out += (
            struct.pack("<d", value)
            if t == T_DOUBLE
            else int(value).to_bytes(8, "little", signed=t == T_SFIXED64)
        )
    elif t in _FIXED32_TYPES:
        _write_varint(out, desc.number << 3 | 5)
        out += (
            struct.pack("<f", value)
            if t == T_FLOAT
            else int(value).to_bytes(4, "little", signed=t == T_SFIXED32)
        )
    elif t == T_STRING:
        payload = value.encode("utf-8")
        _write_varint(out, desc.number << 3 | 2)
        _write_varint(out, len(payload))
        out += payload
    elif t == T_BYTES:
        payload = bytes(value)
        _write_varint(out, desc.number << 3 | 2)
        _write_varint(out, len(payload))
        out += payload
    elif t == T_MESSAGE:
        payload = value.SerializeToString()
        _write_varint(out, desc.number << 3 | 2)
        _write_varint(out, len(payload))
        out += payload
    else:
        raise NotImplementedError(f"field type {t} not supported")


def _decode_numeric(desc: FieldDesc, raw: int):
    t = desc.type
    if t == T_BOOL:
        return bool(raw)
    if t in (T_SINT32, T_SINT64):
        return (raw >> 1) ^ -(raw & 1)
    if t in (T_INT32, T_INT64):
        return _to_signed(raw)
    if t == T_ENUM:
        return _to_signed(raw)
    return raw  # uint32/uint64


def _decode_fixed(desc: FieldDesc, raw: int):
    t = desc.type
    if t == T_DOUBLE:
        return struct.unpack("<d", raw.to_bytes(8, "little"))[0]
    if t == T_FLOAT:
        return struct.unpack("<f", raw.to_bytes(4, "little"))[0]
    if t == T_SFIXED64:
        return _to_signed(raw, 64)
    if t == T_SFIXED32:
        return _to_signed(raw, 32)
    return raw


def _decode_field(desc: FieldDesc, wire: int, raw):
    t = desc.type
    if t in _VARINT_TYPES:
        return _decode_numeric(desc, raw)
    if t in _FIXED64_TYPES or t in _FIXED32_TYPES:
        return _decode_fixed(desc, raw)
    if t == T_STRING:
        return raw.decode("utf-8")
    if t == T_BYTES:
        return bytes(raw)
    if t == T_MESSAGE:
        child = desc.message_cls()
        child.ParseFromString(raw)
        return child
    raise NotImplementedError(f"field type {t} not supported")


# ---------------------------------------------------------------------------
# module synthesis + shim installation
# ---------------------------------------------------------------------------


def build_namespace(serialized_fdp: bytes) -> dict:
    """serialized FileDescriptorProto -> {name: message class / enum
    constant} with the layout generated modules expose (top-level
    message classes and top-level enum VALUE names as module
    attributes)."""
    _pkg, messages, enums = parse_file_descriptor(serialized_fdp)
    classes: dict[str, type] = {}
    for mdesc in messages:
        cls = type(mdesc.name, (MiniMessage,), {"_DESC": mdesc})
        classes[mdesc.full_name] = cls
    for mdesc in messages:  # link message-typed fields
        for f in mdesc.fields:
            if f.type == T_MESSAGE:
                f.message_cls = classes[f.type_name]
    ns: dict[str, object] = {}
    for full, cls in classes.items():
        ns.setdefault(cls.__name__, cls)
    for _scope, ename, values in enums:
        enum_ns = types.SimpleNamespace(**{n: v for n, v in values})
        ns.setdefault(ename, enum_ns)
        for n, v in values:
            ns.setdefault(n, v)
    return ns


_STATE_MESSAGE_MODULE = "pyspark.sql.streaming.proto.StateMessage_pb2"


def _extract_serialized_descriptor() -> bytes:
    """Pull the serialized FileDescriptorProto OUT OF the installed
    pyspark's generated module source (the ``AddSerializedFile(b'...')``
    argument) so the shim always matches the running pyspark version —
    nothing is vendored or copied."""
    import ast
    import importlib.machinery

    # PathFinder directly (not importlib.util.find_spec): the latter
    # consults sys.modules first, so once the shim is installed it
    # would find the SHIM instead of the generated file on disk
    import pyspark.sql.streaming.proto as proto_pkg

    spec = importlib.machinery.PathFinder.find_spec(
        _STATE_MESSAGE_MODULE.rsplit(".", 1)[1], list(proto_pkg.__path__)
    )
    if spec is None or spec.loader is None:
        raise ImportError(f"{_STATE_MESSAGE_MODULE} not found")
    # loader.get_source, not open(spec.origin): worker processes load
    # pyspark from SPARK_HOME's pyspark.zip, where origin is a path
    # INSIDE the archive that open() cannot read but zipimport can
    source = spec.loader.get_source(spec.name)
    if source is None:
        raise ImportError(f"no source for {_STATE_MESSAGE_MODULE}")
    tree = ast.parse(source)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "AddSerializedFile"
            and node.args
        ):
            return ast.literal_eval(node.args[0])
    raise ImportError(
        f"no serialized descriptor in {spec.origin}; pyspark layout changed"
    )


def install_state_message_shim() -> types.ModuleType:
    """Make ``import pyspark.sql.streaming.proto.StateMessage_pb2``
    work. Prefers the REAL generated module (when google.protobuf is
    installed); otherwise synthesizes a wire-compatible replacement and
    registers it in sys.modules. Idempotent; safe to call from driver,
    the transformWithState driver worker, and executor workers."""
    if _STATE_MESSAGE_MODULE in sys.modules:
        return sys.modules[_STATE_MESSAGE_MODULE]
    try:
        import importlib

        return importlib.import_module(_STATE_MESSAGE_MODULE)
    except ImportError:
        pass
    ns = build_namespace(_extract_serialized_descriptor())
    mod = types.ModuleType(_STATE_MESSAGE_MODULE)
    mod.__dict__.update(ns)
    mod.__package__ = "pyspark.sql.streaming.proto"
    import importlib.machinery

    # a real ModuleSpec so importlib.util.find_spec on the installed
    # shim returns cleanly instead of raising on __spec__ = None
    mod.__spec__ = importlib.machinery.ModuleSpec(
        _STATE_MESSAGE_MODULE, loader=None
    )
    sys.modules[_STATE_MESSAGE_MODULE] = mod
    try:  # attribute access through the parent package
        import pyspark.sql.streaming.proto as proto_pkg

        proto_pkg.StateMessage_pb2 = mod
    except ImportError:
        pass
    return mod
