from changedatacapture_spark.sources.tables import TABLES, load_table
from changedatacapture_spark.sources.changelog import events_as_changelog

__all__ = ["TABLES", "load_table", "events_as_changelog"]
