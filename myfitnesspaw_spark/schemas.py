"""Schemas for the engine's data model.

The nested ingestion record mirrors the reference's ``MaterializedDay``
(``/root/reference/myfitnesspaw/types.py:14-27``): one row per
(userid, date) with nested meals → entries, exercises, and string/double
maps.  The positional ``exercises[0]/exercises[1]`` convention of the
reference (``tasks.py:600,628``) is made explicit here as two named
fields — implicit positional schema is a trap at scale.

Silver tables mirror the reference DDL (``sql.py:16-145``) with proper
Spark types: DateType instead of ISO text, nullable LongType for the
nutrient sextet (NULL propagation is load-bearing — SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

NUTRIENTS = ["calories", "carbohydrates", "fat", "protein", "sodium", "sugar"]

# map keys in Meal.totals / entry.totals / goals (reference tasks.py:486-491)
_TOTALS = T.MapType(T.StringType(), T.DoubleType())

MEAL_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("short_name", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        T.StructField("totals", _TOTALS),
    ]
)

MEAL_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("totals", _TOTALS),
        T.StructField("entries", T.ArrayType(MEAL_ENTRY_SCHEMA)),
    ]
)

EXERCISE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("info", _TOTALS),  # cardio: minutes, 'calories burned'; strength: sets, 'reps/set', 'weight/set'
    ]
)

# The nested ingestion record (reference MaterializedDay, types.py:14-27).
DAY_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("meals", T.ArrayType(MEAL_SCHEMA)),
        T.StructField("cardio_exercises", T.ArrayType(EXERCISE_SCHEMA)),
        T.StructField("strength_exercises", T.ArrayType(EXERCISE_SCHEMA)),
        T.StructField("goals", _TOTALS),
        T.StructField("notes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("water", T.DoubleType()),
        T.StructField("measurements", _TOTALS),
    ]
)

# Bronze staging table (reference RawDayData, sql.py:7-14): the whole day
# as one canonical-JSON blob, keyed (userid, date).
RAW_DAY_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("rawdaydata", T.StringType()),
    ]
)


def _nutrient_fields() -> list[T.StructField]:
    return [T.StructField(n, T.LongType()) for n in NUTRIENTS]


# Silver tables (reference sql.py:16-145).
MEALS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("name", T.StringType(), False),
        *_nutrient_fields(),
    ]
)

MEAL_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("meal_name", T.StringType(), False),
        T.StructField("short_name", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("unit", T.StringType()),
        *_nutrient_fields(),
    ]
)

GOALS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        *_nutrient_fields(),
    ]
)

CARDIO_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("exercise_name", T.StringType()),
        T.StructField("minutes", T.DoubleType()),
        T.StructField("calories_burned", T.DoubleType()),
    ]
)

STRENGTH_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("exercise_name", T.StringType()),
        T.StructField("sets", T.DoubleType()),
        T.StructField("reps", T.DoubleType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

NOTES_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("type", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)

WATER_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("quantity", T.DoubleType()),
    ]
)

MEASUREMENTS_SCHEMA = T.StructType(
    [
        T.StructField("userid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("measure_name", T.StringType(), False),
        T.StructField("value", T.DoubleType()),
    ]
)

SILVER_SCHEMAS = {
    "Meals": MEALS_SCHEMA,
    "MealEntries": MEAL_ENTRIES_SCHEMA,
    "Goals": GOALS_SCHEMA,
    "CardioExercises": CARDIO_SCHEMA,
    "StrengthExercises": STRENGTH_SCHEMA,
    "Notes": NOTES_SCHEMA,
    "Water": WATER_SCHEMA,
    "Measurements": MEASUREMENTS_SCHEMA,
}
