#version 330 core
// Clipmap terrain: a flat (GRID_SIZE+1)^2 grid displaced by a heightmap
// texture (the reference's terrain pipeline, sdl_viewer/src/terrain_drawer/
// mod.rs:72-141 + its terrain shaders).  The grid is reused at every
// clipmap level; `spacing` doubles per level and `origin` recenters it on
// the camera (camera-relative coordinates, like the point programs).
//
// Sparse filtering: each vertex carries a bitmask of its adjacent quads
// that are fully valid (all four corner heights present) — the reference's
// per-quad adjacency scheme (sdl_viewer/shaders/terrain.gs).  Quad (qx, qy)
// gets bit (qx & 3) + 4 * (qy & 3): unique within any 3x3 quad
// neighborhood, so the geometry stage's three-way AND identifies exactly
// the quad a triangle belongs to.  The reference computes the lists on the
// CPU from elevation tiles; here validity comes from the height window
// texture (NaN = missing), so the mask is derived with a 3x3 neighborhood
// of samples.
uniform mat4 rel_to_clip;
uniform vec2 origin;        // camera-relative world xy of grid vertex (0,0)
uniform float spacing;      // world meters per grid step at this level
uniform vec2 window_min;    // camera-relative world xy of the height window
uniform float window_extent; // world meters covered by the window texture
uniform sampler2D height_tex;
in vec2 grid_pos;

out VS_OUT {
  vec2 uv;
  float valid;
  flat uint quads;
} vs_out;

float height_at(vec2 gpos, out bool ok) {
  vec2 xy = origin + gpos * spacing;
  vec2 uv = (xy - window_min) / window_extent;
  float h = texture(height_tex, uv).r;
  // isnan(): missing tiles are NaN-filled (viewer/terrain.py); a raw
  // h == h test may be folded to true by fast-math drivers (GLSL 3.30
  // does not guarantee NaN semantics for comparisons).
  ok = !isnan(h) && all(greaterThanEqual(uv, vec2(0.0))) &&
       all(lessThanEqual(uv, vec2(1.0)));
  return h;
}

void main() {
  bool ok;
  float h = height_at(grid_pos, ok);
  vec2 xy = origin + grid_pos * spacing;
  vs_out.uv = (xy - window_min) / window_extent;
  vs_out.valid = ok ? 1.0 : 0.0;
  gl_Position = rel_to_clip * vec4(xy, ok ? h : 0.0, 1.0);

  // Validity of the 3x3 vertex neighborhood (dx, dy in -1..1); the center
  // sample reuses the fetch from above (9 fetches per vertex, not 10).
  bool v[9];
  for (int dy = -1; dy <= 1; ++dy) {
    for (int dx = -1; dx <= 1; ++dx) {
      bool vok;
      if (dx == 0 && dy == 0) {
        vok = ok;
      } else {
        height_at(grid_pos + vec2(float(dx), float(dy)), vok);
      }
      v[(dy + 1) * 3 + (dx + 1)] = vok;
    }
  }
  // The four adjacent quads; quad (qdx, qdy) with qdx, qdy in {-1, 0} is
  // valid iff its four corners are.
  uint mask = 0u;
  for (int qdy = -1; qdy <= 0; ++qdy) {
    for (int qdx = -1; qdx <= 0; ++qdx) {
      bool qok = v[(qdy + 1) * 3 + (qdx + 1)] &&
                 v[(qdy + 1) * 3 + (qdx + 2)] &&
                 v[(qdy + 2) * 3 + (qdx + 1)] &&
                 v[(qdy + 2) * 3 + (qdx + 2)];
      if (qok) {
        int qx = int(grid_pos.x) + qdx;
        int qy = int(grid_pos.y) + qdy;
        if (qx >= 0 && qy >= 0) {
          mask |= 1u << uint((qx & 3) + 4 * (qy & 3));
        }
      }
    }
  }
  vs_out.quads = mask;
}
