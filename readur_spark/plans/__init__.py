"""Job plans: checkpointed, resumable extraction runs."""
