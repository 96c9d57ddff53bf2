"""Avro schema rendering of a :class:`TableMapping` — the schema document
the reference publishes to its schema registry.

Reference parity: ``createSchema`` (S4HanaTableMapping.java:577-597) walks
``columnmappings`` and adds one NULLABLE Avro field per column
(``valueschema.add(columnname, getDataType(hanadatatypestring), null,
true)``), flags primary-key fields (``AvroField.setPrimaryKey``, :583-585),
and builds the record through ``ValueSchema`` (:391-397); field names pass
through ``AvroNameEncoder.encodeName`` (S4HanaProducer.java:220 — the
``_xHHHH`` scheme in ``mapping.encode_name``). The HANA-type switch rendered
here is ``getDataType`` (S4HanaTableMapping.java:603-677) line for line.

Rendering choices (the reference uses the public rtdi KafkaAvro datatype
wrappers; this module emits PLAIN Avro any registry/consumer can read):

  * standard logical types where Avro defines them — ``decimal`` (bytes,
    precision/scale), ``date``, ``time-millis``, ``timestamp-micros``
    (TIMESTAMP), ``timestamp-millis`` (SECONDDATE — second precision stored
    in millis, matching the reference's AvroTimestamp choice);
  * bounded strings (CHAR/VARCHAR/NCHAR/NVARCHAR/ALPHANUM) carry their HANA
    length as a ``maxLength`` attribute (extra schema attributes are legal
    Avro and preserved by parsers — the same mechanism the rtdi wrappers
    use for their custom logical types);
  * every field is the nullable union ``["null", T]`` with ``default:
    null`` (the reference passes ``nullable=true`` for every column);
  * PK fields carry ``primarykey: true`` and 1-based ``pkposition`` field
    attributes (AvroField.setPrimaryKey); the original HANA declaration
    rides in a ``hanadatatype`` field attribute so the document round-trips
    the mapping's type information exactly;
  * unknown HANA types raise ``ValueError`` with the reference's wording
    (:674-676).
"""

from __future__ import annotations

import json
import re

from s4hanaconnector_spark.mapping import ColumnMapping, TableMapping

# the reference's parse regex, S4HanaTableMapping.java:604
_DECL_RE = re.compile(r"(\w*)\s*\(?\s*(\d*)\s*,?\s*(\d*)\s*\)?.*")

_AVRO_NAME_OK = re.compile(r"[A-Za-z0-9_]")


def avro_encode_name(name: str) -> str:
    """Avro-STRICT ``_xHHHH`` encoding (AvroNameEncoder.encodeName,
    S4HanaProducer.java:220): Avro names must match
    ``[A-Za-z_][A-Za-z0-9_]*``, so unlike the filesystem encoder
    (``mapping.encode_name``, which keeps ``.``) this one also encodes
    dots and a leading digit — the reference needs two encoders for the
    same reason."""
    out: list[str] = []
    for i, ch in enumerate(name):
        ok = _AVRO_NAME_OK.match(ch) and not (i == 0 and ch.isdigit())
        if ok and not (ch == "_" and name[i + 1 : i + 2] == "x"):
            out.append(ch)
        else:
            cp = ord(ch)
            if cp > 0xFFFF:
                # one _xHHHH escape per UTF-16 code unit: the decoder's
                # fixed 4-hex grammar stays total and injective for astral
                # characters (a 5-hex escape would make "\U0001f600" and
                # "\u1f60" + "0" collide and break the round trip)
                cp -= 0x10000
                out.append(f"_x{0xD800 + (cp >> 10):04x}")
                out.append(f"_x{0xDC00 + (cp & 0x3FF):04x}")
            else:
                out.append(f"_x{cp:04x}")
    return "".join(out)

_PLAIN: dict[str, str | dict] = {
    # integers (AvroShort/AvroInt/AvroLong, :619-626). Avro has no 16-bit
    # type, so SHORT widens to int; HANA TINYINT is UNSIGNED 0..255 (:619)
    # and therefore must not narrow to a signed byte.
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "long",
    # floats (:629-632)
    "REAL": "float",
    "DOUBLE": "double",
    # binary (:638-641,651,663)
    "BINARY": "bytes",
    "VARBINARY": "bytes",
    "BLOB": "bytes",
    "BINTEXT": "bytes",
    # temporal (:643-647,667)
    "DATE": {"type": "int", "logicalType": "date"},
    "TIME": {"type": "int", "logicalType": "time-millis"},
    "TIMESTAMP": {"type": "long", "logicalType": "timestamp-micros"},
    "SECONDDATE": {"type": "long", "logicalType": "timestamp-millis"},
    # unbounded text (AvroCLOB/AvroNCLOB, :649,659-665)
    "CLOB": "string",
    "NCLOB": "string",
    "TEXT": "string",
    "SHORTTEXT": "string",
    # geometry as WKT strings (documented deviation from the reference's
    # AvroSTPoint/AvroSTGeometry wrappers; types.py makes the same choice)
    "ST_POINT": "string",
    "ST_GEOMETRY": "string",
    "BOOLEAN": "boolean",
}

_BOUNDED_STRING = {"CHAR", "VARCHAR", "NCHAR", "NVARCHAR", "ALPHANUM"}


def hana_to_avro(decl: str) -> str | dict:
    """Avro type (JSON shape) for one HANA type declaration —
    ``getDataType`` (S4HanaTableMapping.java:603-677)."""
    m = _DECL_RE.match(decl or "")
    base = (m.group(1) if m else "").upper()
    length = int(m.group(2)) if m and m.group(2) else 0
    scale = int(m.group(3)) if m and m.group(3) else 0
    if base in _PLAIN:
        t = _PLAIN[base]
        return dict(t) if isinstance(t, dict) else t
    if base in _BOUNDED_STRING:
        out: dict = {"type": "string"}
        if length:
            out["maxLength"] = length
        return out
    if base == "DECIMAL":
        # bare DECIMAL: float-ish decimal, max precision (types.py choice)
        p = length if length else 38
        s = scale if length else 10
        return {"type": "bytes", "logicalType": "decimal", "precision": p, "scale": s}
    if base == "SMALLDECIMAL":
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": length if length else 16,
            "scale": scale,
        }
    raise ValueError(
        f"Table contains a data type which is not known: {decl!r} "
        "(S4HanaTableMapping.java:674-676)"
    )


def field_to_avro(cm: ColumnMapping, pkcolumns: list[str]) -> dict:
    """One nullable Avro field (createSchema, S4HanaTableMapping.java:580-586)."""
    avro_t = hana_to_avro(cm.hanadatatype) if cm.hanadatatype else "string"
    f: dict = {
        "name": avro_encode_name(cm.alias),
        "type": ["null", avro_t],
        "default": None,
    }
    if cm.hanadatatype:
        f["hanadatatype"] = cm.hanadatatype
    src = cm.source_column or cm.alias
    if src in pkcolumns:
        f["primarykey"] = True
        f["pkposition"] = pkcolumns.index(src) + 1
    return f


def mapping_to_avro(mapping: TableMapping, namespace: str | None = None) -> dict:
    """The full Avro record document for one mapping — what the reference
    registers per topic (getAvroSchema, S4HanaTableMapping.java:391-397).

    Raises the reference's "schema definition file does not contain any
    columns" error (:589-590) on an empty mapping."""
    if not mapping.columnmappings:
        raise ValueError(
            "The schema definition file does not contain any columns! "
            "(S4HanaTableMapping.java:589-590)"
        )
    rec: dict = {
        "type": "record",
        "name": avro_encode_name(mapping.name),
        "fields": [field_to_avro(cm, mapping.pkcolumns) for cm in mapping.columnmappings],
    }
    if namespace:
        rec["namespace"] = namespace
    return rec


def mapping_to_avro_json(mapping: TableMapping, namespace: str | None = None) -> str:
    """Canonical (sorted-keys, 2-space) JSON text of the schema document —
    the byte-stable form for registry upload and golden tests."""
    return json.dumps(mapping_to_avro(mapping, namespace), indent=2, sort_keys=True)


def schema_rows(mapping: TableMapping) -> list[tuple]:
    """Schema-as-rows: one tuple per field, the declared-query surface.

    Columns: (field_pos, field_name, avro_type, logical_type, precision,
    scale, max_length, is_pk, pk_position, hanadatatype) — every attribute
    the reference's registry document carries, flattened for the oracle
    hash gate."""
    rows = []
    for i, f in enumerate(mapping_to_avro(mapping)["fields"], start=1):
        t = f["type"][1]  # the non-null branch of the union
        base = t if isinstance(t, str) else t["type"]
        logical = t.get("logicalType") if isinstance(t, dict) else None
        rows.append(
            (
                i,
                f["name"],
                base,
                logical,
                t.get("precision") if isinstance(t, dict) else None,
                t.get("scale") if isinstance(t, dict) else None,
                t.get("maxLength") if isinstance(t, dict) else None,
                bool(f.get("primarykey", False)),
                f.get("pkposition"),
                f.get("hanadatatype"),
            )
        )
    return rows


# ---------------------------------------------------------------------------
# Registry-style compatibility checking
# ---------------------------------------------------------------------------

# Avro schema-resolution promotions (reader type <- writer types it accepts).
_PROMOTABLE = {
    "long": {"int"},
    "float": {"int", "long"},
    "double": {"int", "long", "float"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _branch(field: dict):
    """The non-null branch of a field's ["null", T] union."""
    t = field["type"]
    return t[1] if isinstance(t, list) else t


def _type_key(t) -> tuple:
    """Canonical comparison key for a field type. Plain names keep the
    (name, None, None, None) shape the promotion table matches on; logical
    types carry their 4-tuple; COMPLEX types (array/record/map) reduce to
    their full canonical JSON — a bare ("array", ...) key would compare
    array<int> equal to array<string> and let the drift gate approve an
    element-type change it exists to reject."""
    if isinstance(t, str):
        return (t, None, None, None)
    if t.get("type") in ("array", "record", "map"):
        return (json.dumps(t, sort_keys=True), "complex", None, None)
    return (t["type"], t.get("logicalType"), t.get("precision"), t.get("scale"))


def compatibility(old: dict, new: dict, mode: str = "backward") -> list[str]:
    """Schema-registry compatibility check between two rendered mapping
    schemas (the gate a registry runs before accepting the re-imported
    mapping the reference publishes after a DDL change — O28/O29's schema
    rebuild, S4HanaTableMapping.java:577-597).

    ``backward``: a consumer on ``new`` can read data written with ``old``
    (the registry default — safe rolling upgrade of consumers).
    ``forward``: a consumer on ``old`` can read data written with ``new``.
    ``full``: both. Returns a list of human-readable issues; empty means
    compatible.

    Checks, in CDC-severity order:
      * primary-key identity — PK set/order changes break MERGE semantics
        downstream even when Avro itself resolves, so they are always
        reported;
      * common fields must keep their type, logical type and
        precision/scale, modulo Avro's numeric/string promotions in the
        direction data flows;
      * fields present on the read side only must carry a default (every
        field this renderer emits is a nullable union with default null,
        so hand-edited schemas are the only way to trip this)."""
    if mode == "full":
        return compatibility(old, new, "backward") + [
            i for i in compatibility(old, new, "forward") if "primary key" not in i
        ]
    if mode not in ("backward", "forward"):
        raise ValueError(f"unknown compatibility mode: {mode}")
    issues: list[str] = []

    old_pk = [(f["name"], f.get("pkposition")) for f in old["fields"] if f.get("primarykey")]
    new_pk = [(f["name"], f.get("pkposition")) for f in new["fields"] if f.get("primarykey")]
    if old_pk != new_pk:
        issues.append(f"primary key changed: {old_pk} -> {new_pk}")

    # data is written with the WRITER schema and read with the READER schema
    writer, reader = (old, new) if mode == "backward" else (new, old)
    wfields = {f["name"]: f for f in writer["fields"]}
    rfields = {f["name"]: f for f in reader["fields"]}

    for name in sorted(wfields.keys() & rfields.keys()):
        wt, rt = _branch(wfields[name]), _branch(rfields[name])
        wk, rk = _type_key(wt), _type_key(rt)
        if wk == rk:
            continue
        # plain-type promotion only applies when neither side is logical
        if wk[1] is None and rk[1] is None and wk[0] in _PROMOTABLE.get(rk[0], set()):
            continue
        issues.append(f"field '{name}': reader type {rk} cannot resolve writer type {wk}")

    for name in sorted(rfields.keys() - wfields.keys()):
        f = rfields[name]
        if "default" not in f:
            issues.append(
                f"field '{name}' exists only in the reader schema and has no default"
            )
    return issues


# ---------------------------------------------------------------------------
# Spark-schema bridge — drift gating for INCOMING batches
# ---------------------------------------------------------------------------


def spark_type_to_avro(dt) -> str | dict:
    """Spark DataType -> Avro type (logical types for date/timestamp/
    decimal, recursion for array/struct) — the write-side counterpart of
    ``hana_to_avro`` so a live DataFrame schema can face the same registry
    gate as a rendered mapping."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_avro(dt.elementType)}
    if isinstance(dt, T.StructType):
        return spark_schema_to_avro(dt, name="record")
    raise ValueError(f"no Avro mapping for Spark type {dt}")


def spark_schema_to_avro(
    schema, name: str = "record", pkcolumns: list[str] | None = None
) -> dict:
    """Render a Spark StructType as the same Avro record document
    ``mapping_to_avro`` emits (nullable unions with null defaults, PK
    flags/positions), so :func:`compatibility` can gate a live batch
    schema against a registered one."""
    pks = list(pkcolumns or [])
    fields = []
    for f in schema.fields:
        fd = {
            "name": avro_encode_name(f.name),
            "type": ["null", spark_type_to_avro(f.dataType)],
            "default": None,
        }
        if f.name in pks:
            fd["primarykey"] = True
            fd["pkposition"] = pks.index(f.name) + 1
        fields.append(fd)
    return {"type": "record", "name": avro_encode_name(name), "fields": fields}


def schema_drift(
    old_schema,
    new_schema,
    mode: str = "backward",
    pkcolumns: list[str] | None = None,
) -> list[str]:
    """Registry-style drift gate between two LIVE Spark schemas (e.g. the
    maintained snapshot vs an incoming poll batch): render both as Avro and
    run the compatibility rules. Empty list = the batch may be applied /
    the evolved schema registered; non-empty = reject loudly BEFORE
    apply_changes mutates state — the order the reference implies by
    registering the rebuilt schema ahead of producing rows with it
    (S4HanaTableMapping.java:577-597)."""
    return compatibility(
        spark_schema_to_avro(old_schema, "t", pkcolumns),
        spark_schema_to_avro(new_schema, "t", pkcolumns),
        mode,
    )


def avro_decode_name(name: str) -> str:
    """Inverse of :func:`avro_encode_name`: every ``_xHHHH`` escape decodes
    back to its UTF-16 code unit, then surrogate pairs recombine into their
    astral characters. Total on this renderer's output (the encoder escapes
    any literal ``_x``, so no ambiguity survives a round trip)."""
    s = re.sub(r"_x([0-9a-f]{4})", lambda m: chr(int(m.group(1), 16)), name)
    return s.encode("utf-16", "surrogatepass").decode("utf-16")


def avro_to_mapping(schema: dict, mastertable: str | None = None) -> TableMapping:
    """Registry import: rebuild a :class:`TableMapping` from a rendered
    schema document — the inverse of :func:`mapping_to_avro`, closing the
    registry round trip (the reference only ever writes schemas; a consumer
    standing up a replica needs to READ one back into a typed mapping).

    Field names decode from the ``_xHHHH`` scheme; HANA declarations ride
    the ``hanadatatype`` attribute the renderer emits (fields without one
    import as typeless, like a hand-written mapping); PK columns are
    recovered from the ``primarykey``/``pkposition`` flags in position
    order. ``mapping_to_avro(avro_to_mapping(s)) == s`` for any schema this
    renderer produced."""
    name = avro_decode_name(schema["name"])
    cms: list[ColumnMapping] = []
    pks: list[tuple[int, str]] = []
    for f in schema["fields"]:
        alias = avro_decode_name(f["name"])
        cms.append(
            ColumnMapping(alias, f'"L1"."{alias}"', f.get("hanadatatype"))
        )
        if f.get("primarykey"):
            pks.append((f["pkposition"], alias))
    return TableMapping(
        name=name,
        mastertable=mastertable or name,
        columnmappings=cms,
        pkcolumns=[c for _, c in sorted(pks)],
    )
