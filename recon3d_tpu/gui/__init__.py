"""GUI layer: viewer + app shell (Qt optional, reference src/gui/)."""
