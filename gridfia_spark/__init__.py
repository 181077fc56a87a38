"""gridfia_spark — a from-scratch PySpark-native spatial-join + tiling engine
with the query capabilities of mihiarc/gridfia (see SURVEY.md)."""

__version__ = "0.1.0"
