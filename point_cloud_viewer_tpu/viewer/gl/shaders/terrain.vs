#version 330 core
// Clipmap terrain: a flat (GRID_SIZE+1)^2 grid displaced by a heightmap
// texture (the reference's terrain pipeline, sdl_viewer/src/terrain_drawer/
// mod.rs:72-141 + its terrain shaders).  The grid is reused at every
// clipmap level; `spacing` doubles per level and `origin` recenters it on
// the camera (camera-relative coordinates, like the point programs).
uniform mat4 rel_to_clip;
uniform vec2 origin;        // camera-relative world xy of grid vertex (0,0)
uniform float spacing;      // world meters per grid step at this level
uniform vec2 window_min;    // camera-relative world xy of the height window
uniform float window_extent; // world meters covered by the window texture
uniform sampler2D height_tex;
in vec2 grid_pos;
out vec2 v_uv;
out float v_valid;
void main() {
  vec2 xy = origin + grid_pos * spacing;
  vec2 uv = (xy - window_min) / window_extent;
  float h = texture(height_tex, uv).r;
  // NaN heights (outside loaded tiles) collapse the vertex; mark invalid.
  v_valid = (h == h && all(greaterThanEqual(uv, vec2(0.0))) &&
             all(lessThanEqual(uv, vec2(1.0)))) ? 1.0 : 0.0;
  gl_Position = rel_to_clip * vec4(xy, (h == h) ? h : 0.0, 1.0);
  v_uv = uv;
}
