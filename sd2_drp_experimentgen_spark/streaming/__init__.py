# Structured Streaming twins of the batch event-window queries.
