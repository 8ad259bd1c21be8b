"""The reference Transformer chain (SURVEY §2.2 T1–T11) as engine operators.

Entity model: the reference's ``Entity`` attribute tree
(``nusamai-citygml/src/object.rs:17-61``) is represented as a plain nested
dict — the semi-structured row escape hatch of SURVEY §1.1:

    value  := scalar wrapper {"t": <type>, "v": ...} where <type> ∈
              {string, code, int, nonneg, double, measure, bool, uri, date,
               point, array, object}
    object := {"t": "object", "typename": str,
               "stereotype": "feature"|"data"|"object",
               "id": str|None,
               "geometries": [ {"type","lod","pos","len"} ... ]   (features),
               "attrs": [[key, value], ...]}                       (ordered!)

Ordered ``attrs`` lists mirror the reference's IndexMap ordering guarantee
(object.rs:15). The tree functions below are pure Python (unit-testable
without Spark, matching the reference's transform unit tests); the Spark
execution path serializes the tree as a JSON column and runs the chain via
``mapInPandas`` (1→N row mapping == the reference's ``Transform`` trait,
``nusamai/src/transformer/mod.rs:30-35``). Each transform also has a
``transform_schema``-like effect documented inline (SURVEY §1.3).
"""

from __future__ import annotations

import json
from typing import Any

# ---------------------------------------------------------------------------
# T4 — EditFieldNamesTransform (transformer/transform/attrname.rs:62-138)
# ---------------------------------------------------------------------------

def rename_field(name: str, exact_map: dict, general_map: dict) -> str:
    """Precedence: exact match > '*:'-wildcard match > strip namespace,
    except 'ns:id' never collapses to bare 'id' (attrname.rs:94-117)."""
    if name in exact_map:
        return exact_map[name]
    pos = name.find(":")
    if pos < 0:
        return general_map.get(name, name)
    key = name[pos + 1:]
    if key in general_map:
        return general_map[key]
    if key == "id":
        return name
    return key


def split_rename_rules(rules: dict) -> tuple[dict, dict]:
    """'*:foo' rules go to the general map (attrname.rs:50-59)."""
    exact, general = {}, {}
    for before, after in rules.items():
        if before.startswith("*:"):
            general[before[2:]] = after
        else:
            exact[before] = after
    return exact, general


def rename_tree(value: dict, exact_map: dict, general_map: dict) -> dict:
    """Recursive rename of attribute keys (attrname.rs:119-137)."""
    t = value.get("t")
    if t == "object":
        new_attrs = []
        for key, v in value["attrs"]:
            v2 = rename_tree(v, exact_map, general_map)
            new_attrs.append([rename_field(key, exact_map, general_map), v2])
        out = dict(value)
        out["attrs"] = new_attrs
        return out
    if t == "array":
        out = dict(value)
        out["v"] = [rename_tree(v, exact_map, general_map) for v in value["v"]]
        return out
    return value


# ---------------------------------------------------------------------------
# T5 — FilterLodTransform (transformer/transform/lods.rs:30-93)
# ---------------------------------------------------------------------------

def find_lods_mask(value: dict) -> int:
    """u8 LOD bitmask over the whole tree (lods.rs:76-93)."""
    mask = 0
    t = value.get("t")
    if t == "object":
        if value.get("stereotype") == "feature":
            for g in value.get("geometries", ()):
                mask |= 1 << g["lod"]
        for _, v in value["attrs"]:
            mask |= find_lods_mask(v)
    elif t == "array":
        for v in value["v"]:
            mask |= find_lods_mask(v)
    return mask


def highest_lod(mask: int) -> int | None:
    return None if mask == 0 else mask.bit_length() - 1


def lowest_lod(mask: int) -> int | None:
    return None if mask == 0 else (mask & -mask).bit_length() - 1


def _lod_edit_tree(value: dict, target_lod: int) -> bool:
    """Keep only target-LOD geometries; drop empty subtrees (lods.rs:50-74).
    Returns whether this subtree is retained."""
    t = value.get("t")
    if t == "object":
        retain = False
        if value.get("stereotype") == "feature":
            geoms = [g for g in value.get("geometries", ()) if g["lod"] == target_lod]
            value["geometries"] = geoms
            retain |= bool(geoms)
        else:
            retain = True
        new_attrs = []
        for key, v in value["attrs"]:
            child = _lod_edit_tree(v, target_lod)
            retain |= child
            if child:
                new_attrs.append([key, v])
        value["attrs"] = new_attrs
        return retain
    if t == "array":
        value["v"] = [v for v in value["v"] if _lod_edit_tree(v, target_lod)]
        return bool(value["v"])
    return True


def filter_lod(tree: dict, mode: str = "lowest", mask: int = 0b11111) -> dict | None:
    """mode ∈ {'highest','lowest'}; returns None if no LOD remains."""
    lods = find_lods_mask(tree) & mask
    target = highest_lod(lods) if mode == "highest" else lowest_lod(lods)
    if target is None:
        return None
    out = json.loads(json.dumps(tree))  # deep copy
    _lod_edit_tree(out, target)
    return out


# ---------------------------------------------------------------------------
# T6 — FlattenTreeTransform (transformer/transform/flatten.rs:89-288)
# ---------------------------------------------------------------------------

def _is_flatten_target(obj: dict, parent: dict | None, feature_opt: str,
                       data_opt: str, object_opt: str) -> bool:
    """flatten.rs:251-288 incl. the gen:genericAttribute exemption."""
    if obj["typename"] == "gen:genericAttribute":
        return False
    st = obj.get("stereotype")
    if st == "feature":
        if feature_opt == "none":
            return False
        if feature_opt == "all":
            return True
        tn = obj["typename"]
        return not (tn.endswith("Surface") or tn.endswith(":Window")
                    or tn.endswith(":Door") or tn.endswith("TrafficArea"))
    if st == "data":
        if data_opt == "none":
            return False
        if data_opt == "top_level_only":
            return parent is None or parent.get("stereotype") != "data"
        return True
    if object_opt == "none":
        return False
    return True


def _flatten_value(value: dict, out: list, parent: dict | None,
                   feature_opt: str, data_opt: str, object_opt: str):
    t = value.get("t")
    if t == "object":
        new_parent = {"stereotype": value.get("stereotype"),
                      "id": value.get("id"),
                      "typename": value["typename"]}
        new_attrs = []
        for key, v in value["attrs"]:
            kept = _flatten_value(v, out, new_parent, feature_opt, data_opt,
                                  object_opt)
            if kept is not None:
                new_attrs.append([key, kept])
        value = dict(value)
        value["attrs"] = new_attrs
        if _is_flatten_target(value, parent, feature_opt, data_opt, object_opt):
            if parent is not None:
                # parentId for feature/object parents; parentType always
                # (flatten.rs:195-219 — Data parents carry no id)
                if parent.get("stereotype") in ("feature", "object"):
                    value["attrs"].append(
                        ["parentId", {"t": "string", "v": parent["id"]}])
                value["attrs"].append(
                    ["parentType", {"t": "string", "v": parent["typename"]}])
            out.append(value)
            return None
        return value
    if t == "array":
        new_arr = []
        for v in value["v"]:
            kept = _flatten_value(v, out, parent, feature_opt, data_opt,
                                  object_opt)
            if kept is not None:
                new_arr.append(kept)
        if not new_arr:
            return None
        value = dict(value)
        value["v"] = new_arr
        return value
    return value


def flatten_tree(tree: dict, feature_opt: str = "none", data_opt: str = "none",
                 object_opt: str = "none") -> list[dict]:
    """1→N: split nested feature/data/object subtrees into separate rows,
    stamping parentId/parentType. Returns the list of output roots."""
    out: list[dict] = []
    root = _flatten_value(json.loads(json.dumps(tree)), out, None,
                          feature_opt, data_opt, object_opt)
    if root is not None:
        out.append(root)
    return out


# ---------------------------------------------------------------------------
# T7 — GeometricMergedownTransform (transform/geommerge.rs:27-68)
# ---------------------------------------------------------------------------

def geometric_mergedown(tree: dict, delete_descendant_features: bool = True) -> dict:
    """Pull all descendant geometries up to the root feature, deduplicated
    (HashSet<GeometryRef> in the reference — order-insensitive set, we keep
    first-seen order for determinism)."""
    tree = json.loads(json.dumps(tree))
    seen: set[tuple] = set()
    merged: list[dict] = []

    def collect(value: dict, is_root: bool):
        t = value.get("t")
        if t == "object":
            if value.get("stereotype") == "feature":
                for g in value.get("geometries", ()):
                    key = (g["type"], g["lod"], g["pos"], g["len"])
                    if key not in seen:
                        seen.add(key)
                        merged.append(g)
                if not is_root and delete_descendant_features:
                    value["geometries"] = []
            for _, v in value["attrs"]:
                collect(v, False)
        elif t == "array":
            for v in value["v"]:
                collect(v, False)

    collect(tree, True)
    if tree.get("t") == "object" and tree.get("stereotype") == "feature":
        tree["geometries"] = merged
    return tree


# ---------------------------------------------------------------------------
# T8 — JsonifyTransform (transform/jsonify.rs:30-77)
# ---------------------------------------------------------------------------

def value_to_json(value: dict) -> Any:
    """The reference's canonical JSON projection of a Value
    (nusamai-citygml/src/object.rs:87-125): Code→its value, Measure→f64,
    Date→ISO string, Object→attr map + 'id' + 'type'."""
    t = value.get("t")
    if t in ("string", "code", "uri", "date"):
        return value["v"]
    if t in ("int", "nonneg"):
        return int(value["v"])
    if t in ("double", "measure"):
        return float(value["v"])
    if t == "bool":
        return bool(value["v"])
    if t == "point":
        return {"type": "Point", "coordinates": value["v"]}
    if t == "array":
        return [value_to_json(v) for v in value["v"]]
    if t == "object":
        m = {k: value_to_json(v) for k, v in value["attrs"]}
        if value.get("id") is not None:
            m["id"] = value["id"]
        m["type"] = value["typename"]
        return m
    raise ValueError(f"unknown value type {t}")


def jsonify_tree(tree: dict, jsonify_arrays: bool = False) -> dict:
    """Replace nested object (and optionally array) attributes with JSON
    strings (jsonify.rs:30-55)."""
    tree = json.loads(json.dumps(tree))

    def walk(value: dict) -> dict:
        t = value.get("t")
        if t == "object":
            new_attrs = []
            for k, v in value["attrs"]:
                vt = v.get("t")
                if vt == "object" or (jsonify_arrays and vt == "array"):
                    new_attrs.append([k, {
                        "t": "string",
                        "v": json.dumps(value_to_json(v), ensure_ascii=False,
                                        separators=(",", ":"))}])
                else:
                    new_attrs.append([k, walk(v)])
            value = dict(value)
            value["attrs"] = new_attrs
            return value
        if t == "array":
            value = dict(value)
            value["v"] = [walk(v) for v in value["v"]]
            return value
        return value

    return walk(tree)


# ---------------------------------------------------------------------------
# T9 — DotNotationTransform (transform/dots.rs:15-73)
# ---------------------------------------------------------------------------

def dot_notation(tree: dict) -> list[tuple[str, dict]]:
    """Flatten nested attrs to dotted keys including array indices
    ('a.0.b'). Returns ordered (dotted_key, scalar_value) pairs."""
    out: list[tuple[str, dict]] = []

    def walk(prefix: str, value: dict):
        t = value.get("t")
        if t == "object":
            for k, v in value["attrs"]:
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif t == "array":
            arr = value["v"]
            if len(arr) == 1:
                walk(prefix, arr[0])
            else:
                for i, v in enumerate(arr):
                    walk(f"{prefix}.{i}", v)
        else:
            out.append((prefix, value))

    if tree.get("t") == "object":
        for k, v in tree["attrs"]:
            walk(k, v)
    return out


def dot_notation_tree(tree: dict) -> dict:
    """Root object with flattened dotted attribute keys."""
    out = dict(tree)
    out["attrs"] = [[k, v] for k, v in dot_notation(tree)]
    return out


# ---------------------------------------------------------------------------
# T2 — GeometryStatsTransform (transform/geomstats.rs:13-64)
# ---------------------------------------------------------------------------

def geometry_stats(tree: dict, vertices) -> dict:
    """Add maxHeight/minHeight double attributes from vertex z range
    (geomstats.rs:25-43; schema effect :48-64)."""
    tree = json.loads(json.dumps(tree))
    zs = [v[2] for v in vertices]
    if zs and tree.get("t") == "object":
        tree["attrs"].append(["maxHeight", {"t": "double", "v": max(zs)}])
        tree["attrs"].append(["minHeight", {"t": "double", "v": min(zs)}])
    return tree


# ---------------------------------------------------------------------------
# Spark execution: the chain as a 1→N mapInPandas stage
# ---------------------------------------------------------------------------

def apply_transform_chain(df, chain: list, entity_col: str = "entity"):
    """Run an ordered transform chain over a JSON entity column.

    ``chain`` entries are ("name", kwargs) pairs; 1→N transforms (flatten)
    multiply rows — exactly the reference's SerialTransform over the parcel
    stream (transformer/mod.rs:28-76), executed per Arrow batch.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                trees = [json.loads(rec[entity_col])]
                for name, kwargs in chain:
                    nxt = []
                    for t in trees:
                        if name == "rename":
                            exact, general = split_rename_rules(kwargs.get("rules", {}))
                            nxt.append(rename_tree(t, exact, general))
                        elif name == "filter_lod":
                            r = filter_lod(t, **kwargs)
                            if r is not None:
                                nxt.append(r)
                        elif name == "flatten":
                            nxt.extend(flatten_tree(t, **kwargs))
                        elif name == "mergedown":
                            nxt.append(geometric_mergedown(t, **kwargs))
                        elif name == "jsonify":
                            nxt.append(jsonify_tree(t, **kwargs))
                        elif name == "dots":
                            nxt.append(dot_notation_tree(t))
                        else:
                            raise ValueError(f"unknown transform {name}")
                    trees = nxt
                for t in trees:
                    out = dict(rec)
                    out[entity_col] = json.dumps(t, ensure_ascii=False)
                    rows.append(out)
            if rows:
                yield pd.DataFrame(rows, columns=list(pdf.columns))

    return df.mapInPandas(run, schema=df.schema)
