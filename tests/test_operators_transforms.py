"""Transform-chain parity tests, porting the reference's scenarios:
rename precedence (attrname.rs:144-177), LodMask highest/lowest
(lods.rs:161-187), flatten incl. parentId stamping and the
gen:genericAttribute exemption (flatten.rs:295-727), jsonify/dots semantics,
geometric mergedown dedup."""
import json

from plateau_gis_converter_spark.operators import transforms as tr


# --- T4 rename (attrname.rs tests) -----------------------------------------

def test_rename_precedence():
    exact, general = tr.split_rename_rules({
        "*:class": "分類",
        "luse:class": "土地利用区分",
        "wo_namespace": "wo_namespace_new",
    })
    # In any case, namespace suffix is removed
    assert tr.rename_field("namespace:foo", exact, general) == "foo"
    # Rule written with specific namespace takes precedence
    assert tr.rename_field("bldg:class", exact, general) == "分類"
    assert tr.rename_field("luse:class", exact, general) == "土地利用区分"
    # When the input string has no namespace prefix
    assert tr.rename_field("foo", exact, general) == "foo"
    assert tr.rename_field("wo_namespace", exact, general) == "wo_namespace_new"


def test_rename_invalid_wildcard():
    exact, general = tr.split_rename_rules({"*use:class": "土地利用区分"})
    assert tr.rename_field("luse:class", exact, general) == "class"
    assert tr.rename_field("bldg:class", exact, general) == "class"
    assert tr.rename_field("*use:class", exact, general) == "土地利用区分"


def test_rename_never_strips_gml_id():
    assert tr.rename_field("gml:id", {}, {}) == "gml:id"
    assert tr.rename_field("ns:id", {}, {}) == "ns:id"


# --- T5 LodMask (lods.rs tests) ---------------------------------------------

def test_lod_mask():
    assert tr.highest_lod(0) is None
    assert tr.lowest_lod(0) is None
    assert tr.highest_lod(0b00110) == 2
    assert tr.lowest_lod(0b00110) == 1
    assert tr.highest_lod(0b10000) == 4
    assert tr.lowest_lod(0b00001) == 0


def _feature(typename, fid, lods=(), attrs=None, stereotype="feature"):
    obj = {"t": "object", "typename": typename, "stereotype": stereotype,
           "id": fid,
           "geometries": [{"type": "Surface", "lod": l, "pos": 0, "len": 1}
                          for l in lods],
           "attrs": attrs or []}
    if stereotype == "data":
        obj["id"] = None
        obj.pop("geometries")
    return obj


def test_filter_lod_lowest_and_highest():
    tree = _feature("bldg:Building", "b1", lods=(1, 2), attrs=[
        ["bldg:boundedBy", {"t": "array", "v": [
            _feature("bldg:WallSurface", "w1", lods=(2,))]}],
    ])
    low = tr.filter_lod(tree, "lowest")
    assert [g["lod"] for g in low["geometries"]] == [1]
    # wall has no lod-1 geom → dropped subtree
    assert low["attrs"] == []
    high = tr.filter_lod(tree, "highest")
    assert [g["lod"] for g in high["geometries"]] == [2]
    assert len(high["attrs"]) == 1


def test_filter_lod_drops_entity_without_lods():
    tree = _feature("bldg:Building", "b1", lods=())
    assert tr.filter_lod(tree, "lowest") is None


# --- T6 flatten (flatten.rs tests) ------------------------------------------

def test_flatten_all_stamps_parent():
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[
        ["bldg:boundedBy", {"t": "array", "v": [
            _feature("bldg:WallSurface", "w1", lods=(2,)),
            _feature("bldg:RoofSurface", "r1", lods=(2,)),
        ]}],
    ])
    out = tr.flatten_tree(tree, feature_opt="all")
    assert len(out) == 3
    by_type = {o["typename"]: o for o in out}
    wall = by_type["bldg:WallSurface"]
    attrs = dict((k, v["v"]) for k, v in wall["attrs"])
    assert attrs["parentId"] == "b1"
    assert attrs["parentType"] == "bldg:Building"
    # the children were removed from the parent
    assert by_type["bldg:Building"]["attrs"] == []


def test_flatten_except_thematic_surfaces():
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[
        ["bldg:boundedBy", {"t": "array", "v": [
            _feature("bldg:WallSurface", "w1", lods=(2,))]}],
        ["bldg:consistsOfBuildingPart", {"t": "array", "v": [
            _feature("bldg:BuildingPart", "p1", lods=(1,))]}],
    ])
    out = tr.flatten_tree(tree, feature_opt="all_except_thematic_surfaces")
    types = sorted(o["typename"] for o in out)
    # WallSurface stays nested; BuildingPart splits out
    assert types == ["bldg:Building", "bldg:BuildingPart"]
    root = [o for o in out if o["typename"] == "bldg:Building"][0]
    assert len(root["attrs"]) == 1 and root["attrs"][0][0] == "bldg:boundedBy"


def test_flatten_generic_attribute_exempt():
    gen = _feature("gen:genericAttribute", None, stereotype="data")
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[
        ["gen:genericAttribute", gen]])
    out = tr.flatten_tree(tree, feature_opt="all", data_opt="all")
    assert len(out) == 1
    assert out[0]["attrs"][0][0] == "gen:genericAttribute"


def test_flatten_data_top_level_only():
    inner = _feature("uro:KeyValuePair", None, stereotype="data")
    outer = _feature("uro:BuildingDataQuality", None, stereotype="data",
                     attrs=[["uro:kv", inner]])
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[["uro:dq", outer]])
    out = tr.flatten_tree(tree, data_opt="top_level_only")
    # outer data flattens (parent is a feature); inner stays nested in outer
    assert len(out) == 2
    outer_out = [o for o in out if o["typename"] == "uro:BuildingDataQuality"][0]
    keys = [k for k, _ in outer_out["attrs"]]
    assert "uro:kv" in keys and "parentType" in keys
    # data parents carry no parentId (flatten.rs:205-210)
    assert "parentId" not in keys or dict(outer_out["attrs"])["parentId"]["v"]


# --- T7 mergedown ------------------------------------------------------------

def test_geometric_mergedown_dedup():
    shared = {"type": "Surface", "lod": 2, "pos": 5, "len": 3}
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[
        ["bldg:boundedBy", {"t": "array", "v": [
            _feature("bldg:WallSurface", "w1", lods=()),
        ]}],
    ])
    tree["attrs"][0][1]["v"][0]["geometries"] = [shared, dict(shared)]
    out = tr.geometric_mergedown(tree)
    assert len(out["geometries"]) == 2  # own lod-1 + shared (dedup'd)
    wall = out["attrs"][0][1]["v"][0]
    assert wall["geometries"] == []


# --- T8/T9 jsonify / dots ----------------------------------------------------

def test_jsonify_objects():
    inner = _feature("uro:BuildingIDAttribute", None, stereotype="data",
                     attrs=[["uro:buildingID", {"t": "string", "v": "X123"}]])
    tree = _feature("bldg:Building", "b1", lods=(1,),
                    attrs=[["uro:buildingIDAttribute", inner],
                           ["bldg:height", {"t": "measure", "v": 12.5}]])
    out = tr.jsonify_tree(tree)
    attrs = dict((k, v) for k, v in out["attrs"])
    j = json.loads(attrs["uro:buildingIDAttribute"]["v"])
    assert j == {"uro:buildingID": "X123", "type": "uro:BuildingIDAttribute"}
    assert attrs["bldg:height"]["t"] == "measure"  # scalars untouched


def test_dot_notation():
    tree = _feature("bldg:Building", "b1", lods=(1,), attrs=[
        ["a", {"t": "object", "typename": "x:Y", "stereotype": "data",
               "id": None,
               "attrs": [["b", {"t": "string", "v": "v1"}]]}],
        ["c", {"t": "array", "v": [{"t": "int", "v": 1}, {"t": "int", "v": 2}]}],
        ["d", {"t": "array", "v": [{"t": "string", "v": "only"}]}],
    ])
    flat = tr.dot_notation(tree)
    keys = [k for k, _ in flat]
    assert keys == ["a.b", "c.0", "c.1", "d"]


def test_geometry_stats():
    tree = _feature("bldg:Building", "b1", lods=(1,))
    out = tr.geometry_stats(tree, [[0, 0, 3.5], [0, 0, 12.0], [0, 0, -1.0]])
    attrs = dict((k, v["v"]) for k, v in out["attrs"])
    assert attrs["maxHeight"] == 12.0
    assert attrs["minHeight"] == -1.0


# --- pure-Catalyst flat-schema variants (T2/T5/T8) ---------------------------

def _flat_df(spark):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("feature_id", T.StringType()),
        T.StructField("typename", T.StringType()),
        T.StructField("geometries", T.ArrayType(T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("lod", T.IntegerType()),
            T.StructField("pos", T.LongType()),
            T.StructField("len", T.LongType()),
        ]))),
        T.StructField("vertices", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("function", T.StringType()),
    ])
    rows = [
        ("f1", "bldg:Building",
         [("Solid", 1, 0, 4), ("Solid", 2, 4, 8)],
         [[0.0, 0.0, 5.0], [1.0, 0.0, 12.5], [1.0, 1.0, -1.0]], "residential"),
        ("f2", "bldg:Building", [("Solid", 0, 0, 4)],
         [[0.0, 0.0, 3.0]], "commercial"),
        ("f3", "bldg:Building", [], [], "empty"),
    ]
    return spark.createDataFrame(rows, schema)


def test_catalyst_filter_lod_matches_tree_walk(spark):
    from plateau_gis_converter_spark.operators import transforms_catalyst as tc

    df = _flat_df(spark)
    hi = {r["feature_id"]: [g["lod"] for g in r["geometries"]]
          for r in tc.filter_lod(df, "highest").collect()}
    lo = {r["feature_id"]: [g["lod"] for g in r["geometries"]]
          for r in tc.filter_lod(df, "lowest").collect()}
    assert hi == {"f1": [2], "f2": [0]}   # f3 dropped (no lods)
    assert lo == {"f1": [1], "f2": [0]}
    # tree-walk reference on the same feature
    tree = _feature("bldg:Building", "f1", lods=(1, 2))
    kept = tr.filter_lod(tree, "highest")
    assert [g["lod"] for g in kept["geometries"]] == [2]
    # mask: restrict to lod<=1 -> highest becomes 1
    hi_masked = {r["feature_id"]: [g["lod"] for g in r["geometries"]]
                 for r in tc.filter_lod(df, "highest", mask=0b00011).collect()}
    assert hi_masked == {"f1": [1], "f2": [0]}


def test_catalyst_geometry_stats_and_jsonify(spark):
    import json as _json

    from plateau_gis_converter_spark.operators import transforms_catalyst as tc

    df = tc.geometry_stats(_flat_df(spark))
    got = {r["feature_id"]: (r["maxHeight"], r["minHeight"])
           for r in df.collect()}
    assert got["f1"] == (12.5, -1.0)
    assert got["f2"] == (3.0, 3.0)
    assert got["f3"] == (None, None)  # empty vertex list -> null stats
    j = tc.jsonify(df, ["typename", "function"]).collect()[0]
    parsed = _json.loads(j["attributes_json"])
    assert parsed["typename"] == "bldg:Building"


def test_catalyst_chain_has_no_python_stage(spark):
    """The MVT requirements chain on flat rows must compile to pure JVM
    expressions — no Python/Arrow eval operator anywhere in the plan."""
    from plateau_gis_converter_spark.operators import transforms_catalyst as tc

    out = tc.mvt_requirements_chain(_flat_df(spark), "highest",
                                    attr_cols=["typename", "function"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "ArrowEval", "FlatMapsInPandas", "mapInPandas"):
        assert marker not in plan, f"unexpected {marker} stage:\n{plan}"
    assert out.count() == 2
