"""WKT2 ↔ PROJJSON conversion (reference F11–F13, src/crsstrings.jl:45-383).

The reference hand-rolls a WKT2 → PROJJSON converter (wkt2json,
crsstrings.jl:45-322), a WKT2 string parser (wktstr2wktdict,
crsstrings.jl:346-368 — via Julia's Meta.parse), and a PROJJSON → EPSG/ESRI
code extractor (projjsoncode, crsstrings.jl:370-383). No PROJ exists in
this environment, so all three are re-implemented from scratch:

- ``parse_wkt2``: a recursive-descent tokenizer for the WKT2 bracket
  grammar ``NODE["str", 1.23, CHILD[...]]`` → nested (keyword, args) nodes
- ``wkt2_to_projjson``: GEOGCRS/GEODCRS and PROJCRS (+BASEGEOGCRS,
  CONVERSION, datum/ensemble, ellipsoid, units, axes, ids)
- ``projjson_code``: PROJJSON → "EPSG:xxxx"/"ESRI:xxxx"

Tested differentially against hand-pinned PROJJSON for common codes (the
role of the reference's GDAL differential suite, test/crsstrings.jl).
"""

from __future__ import annotations

import re


class WKTNode:
    __slots__ = ("keyword", "args")

    def __init__(self, keyword: str, args: list):
        self.keyword = keyword
        self.args = args

    def children(self, keyword: str) -> list["WKTNode"]:
        return [a for a in self.args
                if isinstance(a, WKTNode) and a.keyword == keyword]

    def child(self, keyword: str) -> "WKTNode | None":
        c = self.children(keyword)
        return c[0] if c else None

    def __repr__(self):
        return f"WKTNode({self.keyword}, {self.args!r})"


_TOKEN = re.compile(r"""
    \s*(
        "(?:[^"]|"")*"        |   # quoted string ("" escapes)
        [A-Za-z_][A-Za-z0-9_]* |  # keyword / bareword
        [-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)? |  # number
        [\[\]\(\),]               # structure
    )""", re.VERBOSE)


def _tokens(s: str):
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                return
            raise ValueError(f"WKT2 parse error at {pos}: {s[pos:pos+30]!r}")
        pos = m.end()
        yield m.group(1)


def parse_wkt2(s: str) -> WKTNode:
    """WKT2 string → node tree (wktstr2wktdict analog)."""
    toks = list(_tokens(s))
    node, pos = _parse_node(toks, 0)
    return node


def _parse_node(toks, i):
    keyword = toks[i]
    if i + 1 >= len(toks) or toks[i + 1] not in "[(":
        raise ValueError(f"expected '[' after {keyword}")
    i += 2
    args: list = []
    while toks[i] not in "])":
        t = toks[i]
        if t == ",":
            i += 1
            continue
        if t.startswith('"'):
            args.append(t[1:-1].replace('""', '"'))
            i += 1
        elif re.match(r"^[-+]?[0-9]", t):
            args.append(float(t) if ("." in t or "e" in t.lower()) else int(t))
            i += 1
        elif i + 1 < len(toks) and toks[i + 1] in "[(":
            child, i = _parse_node(toks, i)
            args.append(child)
        else:  # bareword enum (e.g. axis direction `north`)
            args.append(t)
            i += 1
    return WKTNode(keyword.upper(), args), i + 1


# ---------------------------------------------------------------------------
# WKT2 → PROJJSON
# ---------------------------------------------------------------------------

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"


def _id_json(node: WKTNode) -> dict | None:
    idn = node.child("ID")
    if idn is None:
        return None
    return {"authority": str(idn.args[0]), "code": idn.args[1]}


def _unit_json(node: WKTNode | None, default: str):
    if node is None:
        return default
    name = node.args[0]
    factor = node.args[1] if len(node.args) > 1 else 1.0
    std = {("metre", 1.0): "metre", ("degree", None): "degree"}
    if name == "metre" and factor == 1.0:
        return "metre"
    if name == "degree":
        return "degree"
    kind = {"LENGTHUNIT": "LinearUnit", "ANGLEUNIT": "AngularUnit",
            "SCALEUNIT": "ScaleUnit"}.get(node.keyword, "Unit")
    return {"type": kind, "name": name, "conversion_factor": factor}


def _ellipsoid_json(e: WKTNode) -> dict:
    out = {"name": e.args[0], "semi_major_axis": e.args[1]}
    inv = e.args[2]
    if inv == 0:  # sphere
        out["radius"] = e.args[1]
        del out["semi_major_axis"]
    else:
        out["inverse_flattening"] = inv
    if _id_json(e):
        out["id"] = _id_json(e)
    return out


def _datum_json(crs: WKTNode) -> dict:
    ens = crs.child("ENSEMBLE")
    if ens is not None:
        members = []
        for m in ens.children("MEMBER"):
            mm = {"name": m.args[0]}
            if _id_json(m):
                mm["id"] = _id_json(m)
            members.append(mm)
        acc = ens.child("ENSEMBLEACCURACY")
        out = {
            "name": ens.args[0],
            "members": members,
            "ellipsoid": _ellipsoid_json(ens.child("ELLIPSOID")),
        }
        if acc is not None:
            out["accuracy"] = str(acc.args[0])
        if _id_json(ens):
            out["id"] = _id_json(ens)
        return {"datum_ensemble": out}
    datum = crs.child("DATUM")
    out = {
        "type": "GeodeticReferenceFrame",
        "name": datum.args[0],
        "ellipsoid": _ellipsoid_json(datum.child("ELLIPSOID")),
    }
    if _id_json(datum):
        out["id"] = _id_json(datum)
    pm = crs.child("PRIMEM")
    if pm is not None and pm.args[0] != "Greenwich":
        out["prime_meridian"] = {"name": pm.args[0], "longitude": pm.args[1]}
    return {"datum": out}


def _axis_json(cs_parent: WKTNode) -> dict:
    cs = cs_parent.child("CS")
    axes = []
    unit = None
    for a in cs_parent.children("AXIS"):
        m = re.match(r"^(.*?)\s*\((.*?)\)$", a.args[0])
        name, abbr = (m.group(1), m.group(2)) if m else (a.args[0], "")
        direction = next((x for x in a.args[1:] if isinstance(x, str)), "")
        au = a.child("ANGLEUNIT") or a.child("LENGTHUNIT")
        ax = {
            "name": name.strip().capitalize() if name else abbr,
            "abbreviation": abbr,
            "direction": direction,
            "unit": _unit_json(au, "degree" if (au and au.keyword ==
                                                "ANGLEUNIT") else "metre"),
        }
        mer = a.child("MERIDIAN")  # polar CRS axes (e.g. EPSG:2986):
        if mer is not None:       # direction is along a named meridian
            ax["meridian"] = {"longitude": mer.args[0]}
        axes.append(ax)
    subtype = cs.args[0] if cs is not None else "ellipsoidal"
    return {"subtype": subtype, "axis": axes}


def wkt2_to_projjson(wkt: str | WKTNode) -> dict:
    node = parse_wkt2(wkt) if isinstance(wkt, str) else wkt
    kw = node.keyword
    if kw in ("GEOGCRS", "GEODCRS", "GEOGCS"):
        out = {
            "$schema": _SCHEMA,
            "type": "GeographicCRS" if kw == "GEOGCRS" else "GeodeticCRS",
            "name": node.args[0],
        }
        out.update(_datum_json(node))
        if node.child("CS") is not None:
            out["coordinate_system"] = _axis_json(node)
        if _id_json(node):
            out["id"] = _id_json(node)
        return out
    if kw == "PROJCRS":
        base = node.child("BASEGEOGCRS")
        base_json = {
            "name": base.args[0],
        }
        base_json.update(_datum_json(base))
        if _id_json(base):
            base_json["id"] = _id_json(base)
        conv = node.child("CONVERSION")
        method = conv.child("METHOD")
        params = []
        for p in conv.children("PARAMETER"):
            pj = {"name": p.args[0], "value": p.args[1],
                  "unit": _unit_json(p.child("ANGLEUNIT")
                                     or p.child("LENGTHUNIT")
                                     or p.child("SCALEUNIT"), "metre")}
            if _id_json(p):
                pj["id"] = _id_json(p)
            params.append(pj)
        method_json = {"name": method.args[0]}
        if _id_json(method):
            method_json["id"] = _id_json(method)
        out = {
            "$schema": _SCHEMA,
            "type": "ProjectedCRS",
            "name": node.args[0],
            "base_crs": base_json,
            "conversion": {"name": conv.args[0], "method": method_json,
                           "parameters": params},
        }
        if node.child("CS") is not None:
            out["coordinate_system"] = _axis_json(node)
        if _id_json(node):
            out["id"] = _id_json(node)
        return out
    raise ValueError(f"unsupported WKT2 root: {kw}")


def projjson_code(doc: dict) -> str:
    """PROJJSON → 'EPSG:xxxx' / 'ESRI:xxxx' (projjsoncode,
    crsstrings.jl:370-383)."""
    idn = doc.get("id")
    if not idn:
        raise ValueError("PROJJSON has no id")
    return f"{idn['authority']}:{idn['code']}"
