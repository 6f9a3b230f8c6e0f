"""External-service connectors (reference: ftm_datalake/connectors/)."""
