#version 330 core
// Sparse-terrain quad filtering — the reference's geometry stage
// (sdl_viewer/shaders/terrain.gs): each vertex carries a bitmask of its
// adjacent fully-valid quads; the intersection of a triangle's three masks
// is the id of the quad the triangle belongs to (bits are unique within
// the neighborhood), or zero if that quad must not be rendered.  Dropping
// the whole triangle here removes the half-quad artifacts a per-fragment
// indicator test cannot (the vertex opposite the diagonal is invisible to
// the fragment interpolation).
layout (triangles) in;
layout (triangle_strip, max_vertices = 3) out;

in VS_OUT {
  vec2 uv;
  float valid;
  flat uint quads;
} gs_in[];

out vec2 v_uv;
out float v_valid;

void main() {
  uint render_quad = gs_in[0].quads & gs_in[1].quads & gs_in[2].quads;
  if (render_quad > 0u) {
    for (int i = 0; i < 3; ++i) {
      gl_Position = gl_in[i].gl_Position;
      v_uv = gs_in[i].uv;
      v_valid = gs_in[i].valid;
      EmitVertex();
    }
    EndPrimitive();
  }
}
