"""Host-side utilities: run management, visualization, torch interop, edges."""
