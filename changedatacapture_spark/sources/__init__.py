from changedatacapture_spark.sources.tables import TABLES, load_table
from changedatacapture_spark.sources.changelog import events_as_changelog
from changedatacapture_spark.sources.csv import load_csv, write_csv

__all__ = ["TABLES", "load_table", "events_as_changelog", "load_csv", "write_csv"]
