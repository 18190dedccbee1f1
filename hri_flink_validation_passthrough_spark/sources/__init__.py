"""Source builders: Kafka option surfaces, memory test doubles, and the
normalized control/data envelope the pipeline operates on."""
