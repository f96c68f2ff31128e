"""External-tool integrations (reference src/tools/)."""
