from pathtracer.film.film import (
    Film,
    accumulate,
    new_film,
    rmse,
    save_checkpoint,
    load_checkpoint,
    to_display,
    write_png,
    read_png,
)

__all__ = [
    "Film", "accumulate", "new_film", "rmse", "save_checkpoint",
    "load_checkpoint", "to_display", "write_png", "read_png",
]
