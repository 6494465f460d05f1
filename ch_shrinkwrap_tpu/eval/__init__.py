from .metrics import points_from_mesh, average_squared_distance
