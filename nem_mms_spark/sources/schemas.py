"""Static package schema registry — the reference's six report schemas
re-expressed as Spark StructTypes (facts transcribed from
/root/reference/src/packages/schema.rs:9-131; type mapping per SURVEY.md
§1.2: Utf8->string, Float64->double, Timestamp(s)->timestamp_ntz,
Boolean->boolean, Int16->short, Int8->byte).

Resolution from an information record's (report_type, report_subtype) pair
follows /root/reference/src/packages/mod.rs:89-100; unknown pairs are
skipped with a warning, not fatal (mod.rs:201-207).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, typ: T.DataType, nullable: bool) -> T.StructField:
    return T.StructField(name, typ, nullable)


_S, _D, _TS, _B, _I16, _I8 = (
    T.StringType(),
    T.DoubleType(),
    T.TimestampNTZType(),
    T.BooleanType(),
    T.ShortType(),
    T.ByteType(),
)

DISPATCH_UNIT_SCADA = T.StructType([
    _f("DUID", _S, False),
    _f("SETTLEMENTDATE", _TS, False),
    _f("SCADAVALUE", _D, True),
])

DISPATCH_NEGATIVE_RESIDUE = T.StructType([
    _f("SETTLEMENTDATE", _TS, False),
    _f("NRM_DATETIME", _TS, False),
    _f("DIRECTIONAL_INTERCONNECTORID", _S, False),
    _f("NRM_ACTIVATED_FLAG", _B, True),
    _f("CUMUL_NEGRESIDUE_AMOUNT", _D, True),
    _f("CUMUL_NEGRESIDUE_PREV_TI", _D, True),
    _f("NEGRESIDUE_CURRENT_TI", _D, True),
    _f("NEGRESIDUE_PD_NEXT_TI", _D, True),
    _f("PRICE_REVISION", _S, True),
    _f("PREDISPATCHSEQNO", _S, True),
    _f("EVENT_ACTIVATED_DI", _TS, True),
    _f("EVENT_DEACTIVATED_DI", _TS, True),
    _f("DI_NOTBINDING_COUNT", _I16, True),
    _f("DI_VIOLATED_COUNT", _I16, True),
    _f("NRM_CONSTRAINT_BLOCKED_FLAG", _B, True),
])

DISPATCH_LOCAL_PRICE = T.StructType([
    _f("SETTLEMENTDATE", _TS, False),
    _f("DUID", _S, False),
    _f("LOCAL_PRICE_ADJUSTMENT", _D, True),
    _f("LOCALLY_CONSTRAINED", _I8, True),
])

ROOFTOP_PV_ACTUAL = T.StructType([
    _f("INTERVAL_DATETIME", _TS, False),
    _f("TYPE", _S, False),
    _f("REGIONID", _S, False),
    _f("POWER", _D, True),
    _f("QI", _D, True),
    _f("LASTCHANGED", _TS, True),
])

ROOFTOP_PV_FORECAST = T.StructType([
    _f("VERSION_DATETIME", _TS, False),
    _f("REGIONID", _S, False),
    _f("INTERVAL_DATETIME", _TS, False),
    _f("POWERMEAN", _D, True),
    _f("POWERPOE50", _D, True),
    _f("POWERPOELOW", _D, True),
    _f("POWERPOEHIGH", _D, True),
    _f("LASTCHANGED", _TS, True),
])

DISPATCHPRICE = T.StructType(
    [
        _f("SETTLEMENTDATE", _TS, False),
        _f("RUNNO", _I16, False),
        _f("REGIONID", _S, False),
        _f("DISPATCHINTERVAL", _S, False),
        _f("INTERVENTION", _I16, False),
    ]
    + [_f(n, _D, True) for n in ("RRP", "EEP", "ROP")]
    + [_f("APCFLAG", _I16, True), _f("MARKETSUSPENDEDFLAG", _I16, True)]
    + [_f("LASTCHANGED", _TS, True)]
    + [
        x
        for svc in (
            "RAISE6SEC", "RAISE60SEC", "RAISE5MIN", "RAISEREG",
            "LOWER6SEC", "LOWER60SEC", "LOWER5MIN", "LOWERREG",
        )
        for x in (
            _f(f"{svc}RRP", _D, True),
            _f(f"{svc}ROP", _D, True),
            _f(f"{svc}APCFLAG", _I16, True),
        )
    ]
    + [_f("PRICE_STATUS", _S, True)]
    + [
        _f(f"PRE_AP_{n}_PRICE", _D, True)
        for n in (
            "ENERGY", "RAISE6", "RAISE60", "RAISE5MIN", "RAISEREG",
            "LOWER6", "LOWER60", "LOWER5MIN", "LOWERREG",
        )
    ]
    + [
        _f(f"CUMUL_PRE_AP_{n}_PRICE", _D, True)
        for n in (
            "ENERGY", "RAISE6", "RAISE60", "RAISE5MIN", "RAISEREG",
            "LOWER6", "LOWER60", "LOWER5MIN", "LOWERREG",
        )
    ]
    + [_f("OCD_STATUS", _S, True), _f("MII_STATUS", _S, True)]
)

PACKAGE_SCHEMAS: dict[str, T.StructType] = {
    "DISPATCH_UNIT_SCADA": DISPATCH_UNIT_SCADA,
    "DISPATCH_NEGATIVE_RESIDUE": DISPATCH_NEGATIVE_RESIDUE,
    "DISPATCH_LOCAL_PRICE": DISPATCH_LOCAL_PRICE,
    "ROOFTOP_PV_ACTUAL": ROOFTOP_PV_ACTUAL,
    "ROOFTOP_PV_FORECAST": ROOFTOP_PV_FORECAST,
    "DISPATCHPRICE": DISPATCHPRICE,
}

# (report_type, report_subtype) -> package name
# (/root/reference/src/packages/mod.rs:89-100)
PACKAGE_OF_REPORT: dict[tuple[str, str], str] = {
    ("DISPATCH", "UNIT_SCADA"): "DISPATCH_UNIT_SCADA",
    ("DISPATCH", "NEGATIVE_RESIDUE"): "DISPATCH_NEGATIVE_RESIDUE",
    ("DISPATCH", "LOCAL_PRICE"): "DISPATCH_LOCAL_PRICE",
    ("ROOFTOP", "ACTUAL"): "ROOFTOP_PV_ACTUAL",
    ("ROOFTOP", "FORECAST"): "ROOFTOP_PV_FORECAST",
    ("DISPATCH", "PRICE"): "DISPATCHPRICE",
}
