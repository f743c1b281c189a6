#version 330 core
// Solid-color lines/triangles (box_drawer outlines, terrain wire debug).
uniform mat4 rel_to_clip;
in vec3 position;
void main() { gl_Position = rel_to_clip * vec4(position, 1.0); }
