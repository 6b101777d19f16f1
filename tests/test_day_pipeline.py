"""Full MaterializedDay pipeline over the reference's own edge-case
fixtures (FIXTURES.md §1 / reference test_tasks.py:50-79): empty note
bodies, empty measurement maps, missing goal keys — serde round-trip
plus every normalization operator, asserted as exact tuple lists."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from myfitnesspaw_spark.operators.normalize import (
    filter_nonempty,
    project_map_keys,
    serialize_struct,
    unpivot_map,
)
from myfitnesspaw_spark.schemas import DAY_SCHEMA, NUTRIENTS

D1, D2, D3 = date(2024, 3, 1), date(2024, 3, 2), date(2024, 3, 3)

# Three days mirroring the reference fixture shapes: a full day, a day
# with an empty-body note + empty measurements, a day with nothing.
DAYS = [
    (
        "fake@fakest.com", D1,
        [
            {
                "name": "breakfast",
                "totals": {"calories": 300.0, "fat": 10.0},
                "entries": [
                    {"short_name": "oats", "quantity": 1.0, "unit": "cup",
                     "totals": {"calories": 300.0}}
                ],
            }
        ],
        [{"name": "run", "info": {"minutes": 30.0, "calories burned": 250.0}}],
        [],
        {"calories": 2000.0},
        {"food": "slept well"},
        2.5,
        {"weight": 80.5},
    ),
    (
        "fake@fakest.com", D2,
        [], [], [],
        {},
        {"food": ""},  # empty body → must be filtered (tasks.py:451)
        0.0,
        {},  # empty measurements → zero unpivot rows
    ),
    ("fake@fakest.com", D3, [], [], [], {}, {}, None, {}),
]


def _days_df(spark):
    return spark.createDataFrame(DAYS, DAY_SCHEMA)


def test_serde_roundtrip_preserves_nested_day(spark):
    days = _days_df(spark)
    bronze = serialize_struct(
        days, ["userid", "date"],
        ["meals", "cardio_exercises", "strength_exercises", "goals", "notes",
         "water", "measurements"],
    )
    parsed = bronze.select(
        "userid", "date",
        F.from_json(
            "payload_json",
            DAY_SCHEMA.simpleString().replace(
                "struct<userid:string,date:date,", "struct<"
            ),
        ).alias("day"),
    ).select("userid", "date", "day.*")
    back = {(r["userid"], r["date"]): r for r in parsed.collect()}
    assert back[("fake@fakest.com", D1)]["meals"][0]["name"] == "breakfast"
    assert back[("fake@fakest.com", D1)]["water"] == 2.5
    assert back[("fake@fakest.com", D2)]["meals"] == []
    assert back[("fake@fakest.com", D3)]["water"] is None


def test_notes_filter_drops_empty_bodies(spark):
    days = _days_df(spark)
    notes = days.select(
        "userid", "date",
        F.col("notes").getItem("food").alias("body"),
    )
    kept = filter_nonempty(notes, "body").collect()
    assert [(r["date"], r["body"]) for r in kept] == [(D1, "slept well")]


def test_goals_projection_missing_keys_null(spark):
    days = _days_df(spark)
    out = project_map_keys(days, "goals", NUTRIENTS, ["userid", "date"])
    rows = {r["date"]: r for r in out.collect()}
    assert rows[D1]["calories"] == 2000.0
    assert rows[D1]["fat"] is None  # key absent → NULL (tasks.py:486-491)
    assert rows[D2]["calories"] is None


def test_measurements_unpivot_empty_maps_drop(spark):
    days = _days_df(spark)
    rows = unpivot_map(days, "measurements", ["userid", "date"]).collect()
    assert [(r["date"], r["key"], r["value"]) for r in rows] == [(D1, "weight", 80.5)]


def test_two_level_meal_explode_with_parent_attribution(spark):
    days = _days_df(spark)
    meals = days.select("userid", "date", F.explode("meals").alias("meal"))
    entries = meals.select(
        "userid", "date", F.col("meal.name").alias("meal_name"),
        F.explode("meal.entries").alias("e"),
    ).select("userid", "date", "meal_name", "e.short_name", "e.quantity")
    assert [tuple(r) for r in entries.collect()] == [
        ("fake@fakest.com", D1, "breakfast", "oats", 1.0)
    ]
