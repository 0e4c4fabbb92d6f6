"""Physical-scene data model: faces, objects, and the Scene container.

Represents the 3D geometry attached to a scenario (buildings, terrain,
vegetation, ...) with the scenario on-disk format — ``vertices.mat`` plus
``objects.json`` metadata (format contract: reference deepmimo/scene.py:
515-690) — so scenes round-trip between toolchains.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import scipy.io

from . import consts as c
from .utils import save_dict_as_json, load_dict_from_json

# Object categories
CAT_BUILDINGS = "buildings"
CAT_TERRAIN = "terrain"
CAT_VEGETATION = "vegetation"
CAT_FLOORPLANS = "floorplans"
CAT_OBJECTS = "objects"

ELEMENT_CATEGORIES = [CAT_BUILDINGS, CAT_TERRAIN, CAT_VEGETATION,
                      CAT_FLOORPLANS, CAT_OBJECTS]


@dataclass
class BoundingBox:
    """Axis-aligned 3D bounding box."""

    bounds: np.ndarray  # (2, 3): [mins; maxs]

    def __init__(self, x_min, x_max, y_min, y_max, z_min, z_max):
        self.bounds = np.array([[x_min, y_min, z_min], [x_max, y_max, z_max]])

    @property
    def x_min(self): return self.bounds[0, 0]

    @property
    def x_max(self): return self.bounds[1, 0]

    @property
    def y_min(self): return self.bounds[0, 1]

    @property
    def y_max(self): return self.bounds[1, 1]

    @property
    def z_min(self): return self.bounds[0, 2]

    @property
    def z_max(self): return self.bounds[1, 2]

    @property
    def width(self): return self.x_max - self.x_min

    @property
    def length(self): return self.y_max - self.y_min

    @property
    def height(self): return self.z_max - self.z_min


class Face:
    """A planar polygonal surface; triangulated on demand (fan split)."""

    def __init__(self, vertices, material_idx: int = 0):
        self.vertices = np.asarray(vertices, dtype=np.float32)
        self.material_idx = int(material_idx)
        self._cache: Dict[str, object] = {}

    @property
    def normal(self) -> np.ndarray:
        if "normal" not in self._cache:
            v1 = self.vertices[1] - self.vertices[0]
            v2 = self.vertices[2] - self.vertices[0]
            n = np.cross(v1, v2)
            self._cache["normal"] = n / np.linalg.norm(n)
        return self._cache["normal"]

    @property
    def triangular_faces(self) -> List[np.ndarray]:
        if "tris" not in self._cache:
            v = self.vertices
            if len(v) == 3:
                self._cache["tris"] = [v]
            else:
                self._cache["tris"] = [
                    np.array([v[0], v[i], v[i + 1]])
                    for i in range(1, len(v) - 1)]
        return self._cache["tris"]

    @property
    def num_triangular_faces(self) -> int:
        return len(self.triangular_faces)

    @property
    def area(self) -> float:
        if "area" not in self._cache:
            n = self.normal
            proj_axis = int(np.argmax(np.abs(n)))
            axes = [i for i in range(3) if i != proj_axis]
            pts = self.vertices[:, axes]
            x, y = pts[:, 0], pts[:, 1]
            self._cache["area"] = 0.5 * abs(
                np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        return self._cache["area"]

    @property
    def centroid(self) -> np.ndarray:
        return np.mean(self.vertices, axis=0)


class PhysicalElement:
    """A physical object: a set of faces with a label and materials."""

    DEFAULT_LABELS = set(ELEMENT_CATEGORIES)

    def __init__(self, faces: List[Face], object_id: int = -1,
                 label: str = CAT_OBJECTS, color: str = "",
                 speed: float = 0.0, name: str = ""):
        self._faces = faces
        self.object_id = object_id
        self.label = label if label in self.DEFAULT_LABELS else CAT_OBJECTS
        self.color = color
        self.speed = speed
        self.name = name
        self._bbox: Optional[BoundingBox] = None

    @property
    def faces(self) -> List[Face]:
        return self._faces

    @property
    def bounding_box(self) -> BoundingBox:
        if self._bbox is None:
            allv = np.vstack([f.vertices for f in self._faces])
            mins, maxs = allv.min(axis=0), allv.max(axis=0)
            self._bbox = BoundingBox(mins[0], maxs[0], mins[1], maxs[1],
                                     mins[2], maxs[2])
        return self._bbox

    @property
    def height(self) -> float:
        return self.bounding_box.height

    @property
    def position(self) -> np.ndarray:
        bb = self.bounding_box
        return 0.5 * (bb.bounds[0] + bb.bounds[1])

    @property
    def materials(self) -> Set[int]:
        return {f.material_idx for f in self._faces}

    @property
    def hull_volume(self) -> float:
        from scipy.spatial import ConvexHull
        allv = np.vstack([f.vertices for f in self._faces])
        try:
            return float(ConvexHull(allv).volume)
        except Exception:
            return 0.0

    @property
    def volume(self) -> float:
        return self.hull_volume

    def to_dict(self, vertex_map: Dict[Tuple[float, ...], int]) -> Dict:
        """Serialize via a shared vertex pool (indices into vertices.mat)."""
        meta = {"name": self.name, "label": self.label, "id": self.object_id,
                "face_vertex_idxs": [], "face_material_idxs": []}
        for face in self._faces:
            idxs: List[int] = []
            for tri in face.triangular_faces:
                for vertex in tri:
                    key = tuple(vertex)
                    if key not in vertex_map:
                        vertex_map[key] = len(vertex_map)
                    if vertex_map[key] not in idxs:
                        idxs.append(vertex_map[key])
            meta["face_vertex_idxs"].append(idxs)
            meta["face_material_idxs"].append(face.material_idx)
        return meta

    @classmethod
    def from_dict(cls, data: Dict, vertices: np.ndarray) -> "PhysicalElement":
        faces = [Face(vertices=vertices[np.asarray(vi, dtype=int)],
                      material_idx=mi)
                 for vi, mi in zip(data["face_vertex_idxs"],
                                   data["face_material_idxs"])]
        return cls(faces=faces, name=data.get("name", ""),
                   object_id=data.get("id", -1),
                   label=data.get("label", CAT_OBJECTS))

    def plot(self, ax=None, **kwargs):
        return Scene._plot_objects([self], ax=ax, **kwargs)

    def __repr__(self) -> str:
        return (f"PhysicalElement(name='{self.name}', id={self.object_id}, "
                f"label='{self.label}', faces={len(self._faces)})")


class PhysicalElementGroup:
    """A filtered collection of physical objects."""

    def __init__(self, objects: List[PhysicalElement]):
        self._objects = objects

    def __len__(self):
        return len(self._objects)

    def __iter__(self):
        return iter(self._objects)

    def __getitem__(self, idx):
        if isinstance(idx, int):
            return self._objects[idx]
        return PhysicalElementGroup([self._objects[i] for i in idx])

    @property
    def bounding_box(self) -> BoundingBox:
        allv = np.vstack([f.vertices for o in self._objects for f in o.faces])
        mins, maxs = allv.min(axis=0), allv.max(axis=0)
        return BoundingBox(mins[0], maxs[0], mins[1], maxs[1],
                           mins[2], maxs[2])

    def get_objects(self, label: Optional[str] = None,
                    material: Optional[int] = None) -> "PhysicalElementGroup":
        objs = self._objects
        if label is not None:
            objs = [o for o in objs if o.label == label]
        if material is not None:
            objs = [o for o in objs if material in o.materials]
        return PhysicalElementGroup(objs)

    def __repr__(self):
        return f"PhysicalElementGroup({len(self._objects)} objects)"


class Scene:
    """All physical objects of a scenario, with export/import and plotting."""

    DEFAULT_VISUALIZATION_SETTINGS = {
        CAT_TERRAIN: {"z_order": 1, "alpha": 0.1, "color": "grey"},
        CAT_VEGETATION: {"z_order": 2, "alpha": 0.8, "color": "green"},
        CAT_BUILDINGS: {"z_order": 3, "alpha": 0.8, "color": None},
        CAT_FLOORPLANS: {"z_order": 4, "alpha": 0.8, "color": "blue"},
        CAT_OBJECTS: {"z_order": 5, "alpha": 0.8, "color": "blue"},
    }

    def __init__(self):
        self.objects: List[PhysicalElement] = []
        self.visualization_settings = dict(self.DEFAULT_VISUALIZATION_SETTINGS)
        self.face_indices: List[List[List[int]]] = []
        self._current_index = 0
        self._objects_by_category: Dict[str, List[PhysicalElement]] = {
            cat: [] for cat in ELEMENT_CATEGORIES}
        self._objects_by_material: Dict[int, List[PhysicalElement]] = {}

    @property
    def bounding_box(self) -> BoundingBox:
        return self.get_objects().bounding_box

    def add_object(self, obj: PhysicalElement) -> None:
        if obj.object_id == -1:
            obj.object_id = len(self.objects)
        obj_indices = []
        for face in obj.faces:
            n_tri = face.num_triangular_faces
            obj_indices.append(list(range(self._current_index,
                                          self._current_index + n_tri)))
            self._current_index += n_tri
        for mat in obj.materials:
            self._objects_by_material.setdefault(mat, []).append(obj)
        cat = obj.label if obj.label in ELEMENT_CATEGORIES else CAT_OBJECTS
        self._objects_by_category.setdefault(cat, []).append(obj)
        self.face_indices.append(obj_indices)
        self.objects.append(obj)

    def add_objects(self, objects: List[PhysicalElement]) -> None:
        for obj in objects:
            self.add_object(obj)

    def get_objects(self, label: Optional[str] = None,
                    material: Optional[int] = None) -> PhysicalElementGroup:
        if label:
            objs = self._objects_by_category.get(label, [])
        elif material is not None:
            objs = self._objects_by_material.get(material, [])
        else:
            objs = self.objects
        group = PhysicalElementGroup(objs)
        return group.get_objects(material=material) if material else group

    # -- persistence ---------------------------------------------------------

    def export_data(self, base_folder: str) -> Dict:
        """Write vertices.mat + objects.json; return scene metadata."""
        os.makedirs(base_folder, exist_ok=True)
        vertex_map: Dict[Tuple[float, ...], int] = {}
        objects_metadata = [obj.to_dict(vertex_map) for obj in self.objects]
        vertices = np.zeros((len(vertex_map), 3), dtype=np.float32)
        for vertex, idx in vertex_map.items():
            vertices[idx] = vertex
        scipy.io.savemat(os.path.join(base_folder, "vertices.mat"),
                         {"vertices": vertices})
        save_dict_as_json(os.path.join(base_folder, "objects.json"),
                          objects_metadata)
        return {
            c.SCENE_PARAM_NUMBER_SCENES: 1,
            c.SCENE_PARAM_N_OBJECTS: len(self.objects),
            c.SCENE_PARAM_N_VERTICES: len(vertices),
            c.SCENE_PARAM_N_FACES: sum(len(o.faces) for o in self.objects),
            c.SCENE_PARAM_N_TRIANGULAR_FACES: self._current_index,
        }

    @classmethod
    def from_data(cls, base_folder: str) -> Optional["Scene"]:
        """Load a scene from vertices.mat + objects.json (None if absent)."""
        vpath = os.path.join(base_folder, "vertices.mat")
        opath = os.path.join(base_folder, "objects.json")
        if not (os.path.exists(vpath) and os.path.exists(opath)):
            return None
        vertices = scipy.io.loadmat(vpath)["vertices"]
        objects_metadata = load_dict_from_json(opath)
        scene = cls()
        for object_data in objects_metadata:
            scene.add_object(PhysicalElement.from_dict(object_data, vertices))
        return scene

    # -- plotting ------------------------------------------------------------

    def plot(self, title: bool = True, ax=None, proj_2d: bool = False,
             figsize: tuple = (10, 10), dpi: int = 100, legend: bool = False):
        return self._plot_objects(self.objects, ax=ax, proj_2d=proj_2d,
                                  figsize=figsize, dpi=dpi, legend=legend,
                                  settings=self.visualization_settings,
                                  title=title)

    @staticmethod
    def _plot_objects(objects, ax=None, proj_2d: bool = False,
                      figsize=(10, 10), dpi=100, legend=False, settings=None,
                      title=True):
        import matplotlib.pyplot as plt
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        settings = settings or Scene.DEFAULT_VISUALIZATION_SETTINGS
        if ax is None:
            fig = plt.figure(figsize=figsize, dpi=dpi)
            ax = fig.add_subplot(111) if proj_2d else \
                fig.add_subplot(111, projection="3d")

        rng = np.random.default_rng(0)
        for obj in objects:
            s = settings.get(obj.label, settings[CAT_OBJECTS])
            color = obj.color or s.get("color") or \
                tuple(rng.uniform(0.2, 0.9, 3))
            alpha = s.get("alpha", 0.8)
            if proj_2d:
                for face in obj.faces:
                    v = face.vertices
                    ax.fill(v[:, 0], v[:, 1], color=color, alpha=alpha)
            else:
                polys = [f.vertices for f in obj.faces]
                ax.add_collection3d(Poly3DCollection(
                    polys, facecolor=color, alpha=alpha, edgecolor="k",
                    linewidths=0.2))
        if not proj_2d and objects:
            allv = np.vstack([f.vertices for o in objects for f in o.faces])
            ax.set_xlim(allv[:, 0].min(), allv[:, 0].max())
            ax.set_ylim(allv[:, 1].min(), allv[:, 1].max())
            ax.set_zlim(allv[:, 2].min(), max(allv[:, 2].max(), 1))
        if title:
            ax.set_title("Scene")
        ax.set_xlabel("x (m)")
        ax.set_ylabel("y (m)")
        return ax

    def __repr__(self):
        return f"Scene({len(self.objects)} objects)"


def get_object_faces(vertices: np.ndarray,
                     decimals: int = 2) -> List[np.ndarray]:
    """Group a vertex soup into planar faces (coplanar clustering).

    Utility for converters that receive unstructured triangle lists: groups
    triangles by their (rounded) plane equation and merges each group into a
    single polygonal face.
    """
    verts = np.asarray(vertices, dtype=np.float64).reshape(-1, 3, 3)
    planes: Dict[tuple, List[np.ndarray]] = {}
    for tri in verts:
        n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
        norm = np.linalg.norm(n)
        if norm < 1e-12:
            continue
        n = n / norm
        # Canonical orientation so opposite-facing normals merge
        if (n[2], n[1], n[0]) < (0, 0, 0):
            n = -n
        d = float(np.dot(n, tri[0]))
        key = tuple(np.round(np.concatenate([n, [d]]), decimals))
        planes.setdefault(key, []).append(tri)
    faces = []
    for tris in planes.values():
        pts = np.unique(np.vstack(tris), axis=0)
        faces.append(pts)
    return faces
