"""Parity tests for category maintenance (J2/J3/W4) and id assignment
(W1/W2) against reference goldens in tests/test_coco_models.py."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from geococo_spark.operators import categories, ids

CAT_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("supercategory", StringType(), False),
    ]
)


def empty_categories(spark):
    return spark.createDataFrame([], CAT_SCHEMA)


def fixture_labels(spark, ids_=True, names=False, supers=None):
    # reference fixture: category_id=[1,2,2,5,5], names ["One","Two","Two","Five","Five"]
    rows = []
    cat_ids = [1, 2, 2, 5, 5]
    cat_names = ["One", "Two", "Two", "Five", "Five"]
    for i in range(5):
        d = {"label_idx": i}
        if ids_:
            d["category_id"] = cat_ids[i]
        if names:
            d["class_names"] = cat_names[i]
        if supers:
            d["super_names"] = supers[i]
        rows.append(Row(**d))
    return spark.createDataFrame(rows)


def cat_tuples(df):
    return sorted((r.id, r.name, r.supercategory) for r in df.collect())


class TestNewCategories:
    def test_ids_only_names_are_str_ids(self, spark):
        # reference tests/test_coco_models.py: ids-only -> name = str(id)
        out = categories.new_categories(
            empty_categories(spark), fixture_labels(spark, ids_=True), id_col="category_id"
        )
        assert cat_tuples(out) == [(1, "1", "1"), (2, "2", "1"), (5, "5", "1")]

    def test_names_only_autoids_sorted(self, spark):
        # names-only -> ids 1..n in sorted-name order (np.unique sorts)
        out = categories.new_categories(
            empty_categories(spark),
            fixture_labels(spark, ids_=False, names=True),
            id_col=None,
            name_col="class_names",
        )
        # sorted names: Five, One, Two -> ids 1,2,3
        assert cat_tuples(out) == [(1, "Five", "1"), (2, "One", "1"), (3, "Two", "1")]

    def test_both_attributes(self, spark):
        out = categories.new_categories(
            empty_categories(spark),
            fixture_labels(spark, ids_=True, names=True),
            id_col="category_id",
            name_col="class_names",
        )
        assert cat_tuples(out) == [(1, "One", "1"), (2, "Two", "1"), (5, "Five", "1")]

    def test_supercategories_carried(self, spark):
        supers = ["A", "A", "A", "B", "B"]
        out = categories.new_categories(
            empty_categories(spark),
            fixture_labels(spark, ids_=True, names=True, supers=supers),
            id_col="category_id",
            name_col="class_names",
            super_col="super_names",
        )
        assert cat_tuples(out) == [(1, "One", "A"), (2, "Two", "A"), (5, "Five", "B")]

    def test_append_new_name_gets_max_matched_plus_one(self, spark):
        # golden: existing {1:One, 2:Two, 5:Five}; appending names-only
        # batch with "Eight" -> auto id 6 (reference tests/test_coco_models.py:340-385)
        existing = spark.createDataFrame(
            [(1, "One", "1"), (2, "Two", "1"), (5, "Five", "1")], CAT_SCHEMA
        )
        incoming = spark.createDataFrame(
            [Row(label_idx=i, class_names=n) for i, n in enumerate(["One", "Two", "Five", "Eight"])]
        )
        out = categories.new_categories(existing, incoming, id_col=None, name_col="class_names")
        assert cat_tuples(out) == [(6, "Eight", "1")]

    def test_append_given_id_kept(self, spark):
        # appending (8, "Eight") with explicit id keeps 8
        existing = spark.createDataFrame(
            [(1, "One", "1"), (2, "Two", "1"), (5, "Five", "1")], CAT_SCHEMA
        )
        incoming = spark.createDataFrame([Row(label_idx=0, category_id=8, class_names="Eight")])
        out = categories.new_categories(
            existing, incoming, id_col="category_id", name_col="class_names"
        )
        assert cat_tuples(out) == [(8, "Eight", "1")]

    def test_all_duplicates_yields_empty(self, spark):
        existing = spark.createDataFrame(
            [(1, "1", "1"), (2, "2", "1"), (5, "5", "1")], CAT_SCHEMA
        )
        out = categories.new_categories(existing, fixture_labels(spark), id_col="category_id")
        assert out.count() == 0

    def test_no_attribute_raises(self, spark):
        with pytest.raises(AttributeError):
            categories.new_categories(
                empty_categories(spark), fixture_labels(spark), id_col="nope", name_col=None
            )

    def test_names_only_no_match_starts_at_1(self, spark):
        # np.nansum([nan, 1]) == 1 when nothing matches
        existing = spark.createDataFrame([(7, "Seven", "1")], CAT_SCHEMA)
        incoming = spark.createDataFrame([Row(label_idx=0, class_names="Zed")])
        out = categories.new_categories(existing, incoming, id_col=None, name_col="class_names")
        assert cat_tuples(out) == [(1, "Zed", "1")]


class TestUpdateLabels:
    def test_join_by_id(self, spark):
        cats = spark.createDataFrame(
            [(1, "One", "A"), (2, "Two", "A"), (5, "Five", "B")], CAT_SCHEMA
        )
        labels = fixture_labels(spark)
        out = categories.update_labels(labels, cats, id_col="category_id")
        rows = {(r.label_idx): (r.id, r.name, r.supercategory) for r in out.collect()}
        assert rows[0] == (1, "One", "A")
        assert rows[2] == (2, "Two", "A")
        assert rows[4] == (5, "Five", "B")

    def test_unmatched_label_dropped_detectable(self, spark):
        # reference raises on unmatched (tests/test_utils.py:575-581);
        # engine contract: inner join + caller count guard
        cats = spark.createDataFrame([(1, "One", "A")], CAT_SCHEMA)
        labels = fixture_labels(spark)
        out = categories.update_labels(labels, cats, id_col="category_id")
        assert out.count() < labels.count()


class TestSequentialIds:
    def test_dense_ids_in_order(self, spark):
        df = spark.createDataFrame([Row(a=2, b=1), Row(a=1, b=2), Row(a=1, b=1), Row(a=3, b=0)])
        out = ids.assign_sequential_ids(df, ["a", "b"], "id").collect()
        got = {(r.a, r.b): r.id for r in out}
        assert got == {(1, 1): 1, (1, 2): 2, (2, 1): 3, (3, 0): 4}

    def test_offset_for_append(self, spark):
        # A7: ids continue from existing count (coco_models.py:24-29)
        df = spark.createDataFrame([Row(a=1), Row(a=2)])
        out = ids.assign_sequential_ids(df, ["a"], "id", offset=10).collect()
        assert sorted(r.id for r in out) == [11, 12]

    def test_two_pass_path_matches_window_path(self, spark):
        df = spark.range(0, 5000).withColumn("key", (F.col("id") * 2654435761) % 100003).drop(
            "id"
        )
        small = ids.assign_sequential_ids(df, ["key"], "sid", small_threshold=10_000_000)
        big = ids.assign_sequential_ids(df, ["key"], "sid", small_threshold=0, num_partitions=7)
        a = [(r.key, r.sid) for r in small.orderBy("sid").collect()]
        b = [(r.key, r.sid) for r in big.orderBy("sid").collect()]
        assert a == b
        assert [x[1] for x in a] == list(range(1, 5001))
