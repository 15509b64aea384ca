"""Host runtime: native queue bindings + the threaded pipeline
(the TPU-native src/main threading topology, SURVEY.md §1)."""
