"""Sources: synthetic pages-corpus generator and Spark readers/sinks."""
