"""Sources and sinks: batch readers, Kafka streaming, CDC envelopes
(SURVEY §2.1 S1-S11)."""
