"""Source/sink formats (SURVEY §2.2) re-expressed on Spark readers."""
