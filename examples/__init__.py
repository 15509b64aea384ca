"""External-app drivers through the public System API (the reference is
driven the same way, System.h:74)."""
