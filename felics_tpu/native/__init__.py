"""ctypes bindings to the native C++ runtime core (see native/ at repo root)."""
